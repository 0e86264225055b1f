"""Unit tests: scrub patterns, langid predictions, perplexity ordering."""

import numpy as np
import pyarrow as pa

from txiac_qc_ray.stages.langid import LangIdModel
from txiac_qc_ray.stages.perplexity import UnigramLM
from txiac_qc_ray.stages.scrub import scrub_texts


def arr(*xs):
    return pa.array(list(xs), type=pa.string())


def test_scrub_email_phone_ssn_ip_tox():
    out, changed = scrub_texts(arr(
        "mail me at a.b@c.org now",
        "call (512) 555-0134 ok",
        "ssn 123-45-6789 .",
        "ip 10.0.0.1 end",
        "you darn Idiot",
        "nothing here",
        None,
    ))
    assert out.to_pylist() == [
        "mail me at <EMAIL> now",
        "call <PHONE> ok",
        "ssn <SSN> .",
        "ip <IP> end",
        "you <TOX> <TOX>",
        "nothing here",
        None,
    ]
    assert changed.tolist() == [True, True, True, True, True, False, False]


def test_scrub_order_email_before_ssn():
    # an SSN-shaped local part is consumed by the (earlier) email pattern
    out, _ = scrub_texts(arr("x 123-45-6789@mail.com y"))
    assert out.to_pylist()[0] == "x <EMAIL> y"


def test_langid_basic():
    m = LangIdModel()
    preds, scores = m.predict(arr(
        "the house and the river of the world",
        "und der die das ist nicht mit wasser berg",
        "le la les des dans pour que avec eau",
        "el la los las para que con sobre agua",
        "#$% @@!! *** $$$ %%^^",
        "",
        None,
    ))
    assert preds.tolist()[:4] == ["en", "de", "fr", "es"]
    assert preds.tolist()[4] == "und"
    assert preds.tolist()[5] == "und"
    assert preds.tolist()[6] is None
    assert scores[0] > 0.9 and np.isnan(scores[6])


def test_ppl_ordering():
    lm = UnigramLM()
    common = "the of and a to in is it that was"       # top-rank words
    rare = "federal entire strong possible late major"  # tail vocab words
    oov = "zzz qqq xxx www yyy vvv"
    p = lm.score(arr(common, rare, oov, "", None))
    assert p[0] < p[1] < p[2]
    assert np.isnan(p[3]) and np.isnan(p[4])
    # OOV-only doc pins to exp(-OOV_LOGP) = 1e6
    assert abs(p[2] - 1e6) / 1e6 < 1e-9


def test_ppl_deterministic():
    lm1, lm2 = UnigramLM(), UnigramLM()
    docs = arr("the house by the river", "state family student group")
    np.testing.assert_array_equal(lm1.score(docs), lm2.score(docs))
