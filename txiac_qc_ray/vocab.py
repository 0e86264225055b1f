"""Frozen vocabularies for the deterministic fixture corpus and the
hand-rolled language-ID / perplexity models.

These lists are the single source of truth shared by:
  - the synthetic `pages` generator (sources/pages.py),
  - the langid model (stages/langid.py: per-language word profiles),
  - the perplexity model (stages/perplexity.py: unigram LM over EN_WORDS).

They are module constants so every score is bit-reproducible across
processes and rounds (FIXTURES.md determinism rules). No external data.
"""

from __future__ import annotations

# English stopwords (subset of the classic SMART/NLTK lists — public knowledge).
EN_STOPWORDS: tuple[str, ...] = (
    "the", "of", "and", "a", "to", "in", "is", "it", "that", "was",
    "for", "on", "are", "as", "with", "his", "they", "at", "be", "this",
    "have", "from", "or", "had", "by", "not", "but", "some", "what",
    "we", "can", "out", "other", "were", "all", "there", "when", "your",
    "how", "an", "each", "she", "which", "do", "their", "if", "will",
    "about", "many", "then", "them", "would", "so", "these", "her",
    "him", "has", "over", "than", "who", "may", "been", "now", "its",
    "did", "get", "our", "me", "he", "you", "no", "into", "more",
)

# Content words for English word-salad prose.
EN_CONTENT: tuple[str, ...] = (
    "system", "data", "river", "mountain", "house", "story", "number",
    "people", "water", "sound", "place", "work", "world", "school",
    "state", "family", "student", "group", "country", "problem", "hand",
    "part", "company", "program", "question", "government", "night",
    "point", "home", "room", "mother", "area", "money", "fact", "month",
    "lot", "right", "study", "book", "eye", "job", "word", "business",
    "issue", "side", "kind", "head", "power", "game", "line", "city",
    "community", "name", "president", "team", "minute", "idea", "body",
    "information", "back", "parent", "face", "level", "office", "door",
    "health", "person", "art", "war", "history", "party", "result",
    "change", "morning", "reason", "research", "girl", "guy", "moment",
    "air", "teacher", "force", "education", "foot", "boy", "age",
    "policy", "process", "music", "market", "sense", "nation", "plan",
    "college", "interest", "death", "experience", "effect", "use",
    "class", "control", "care", "field", "development", "role", "effort",
    "rate", "heart", "drug", "show", "leader", "light", "voice", "wife",
    "whole", "police", "mind", "price", "report", "decision", "son",
    "view", "relationship", "town", "road", "arm", "difference", "value",
    "building", "action", "model", "season", "society", "tax", "director",
    "position", "player", "record", "paper", "space", "ground", "form",
    "event", "official", "matter", "center", "couple", "site", "project",
    "activity", "star", "table", "need", "court", "american", "oil",
    "situation", "cost", "industry", "figure", "street", "image",
    "phone", "either", "inside", "itself", "quite", "general", "cover",
    "common", "poor", "natural", "significant", "similar", "hot",
    "dead", "central", "happy", "serious", "ready", "simple", "left",
    "physical", "federal", "entire", "strong", "possible", "late",
    "little", "important", "small", "large", "early", "young", "major",
)

EN_WORDS: tuple[str, ...] = EN_STOPWORDS + EN_CONTENT

# Three non-English word-salad vocabularies (invented/simplified word
# forms with language-typical character statistics; no real corpora).
DE_WORDS: tuple[str, ...] = (
    "und", "der", "die", "das", "ist", "nicht", "mit", "ein", "eine",
    "auf", "sich", "auch", "nach", "wird", "bei", "einer", "einem",
    "wasser", "berg", "haus", "geschichte", "nummer", "leute", "arbeit",
    "welt", "schule", "staat", "familie", "gruppe", "land", "problem",
    "teil", "firma", "programm", "frage", "regierung", "nacht", "punkt",
    "zimmer", "mutter", "gebiet", "geld", "monat", "recht", "studie",
    "buch", "auge", "wort", "seite", "kopf", "kraft", "spiel", "stadt",
    "gemeinde", "name", "mannschaft", "minute", "idee", "information",
    "eltern", "gesicht", "ebene", "gesundheit", "person", "kunst",
    "krieg", "geschichte", "partei", "ergebnis", "morgen", "grund",
    "forschung", "lehrer", "bildung", "politik", "prozess", "musik",
    "markt", "sinn", "nation", "plan", "interesse", "erfahrung",
    "wirkung", "klasse", "kontrolle", "feld", "entwicklung", "rolle",
    "herz", "licht", "stimme", "frau", "polizei", "preis", "bericht",
    "entscheidung", "sohn", "stadtteil", "werden", "haben", "konnen",
    "machen", "sollen", "sagen", "gehen", "sehen", "geben", "kommen",
)
FR_WORDS: tuple[str, ...] = (
    "le", "la", "les", "des", "une", "est", "dans", "pour", "que",
    "qui", "avec", "sur", "pas", "plus", "par", "mais", "comme", "tout",
    "nous", "vous", "leur", "bien", "sans", "peut", "cette", "faire",
    "eau", "montagne", "maison", "histoire", "nombre", "gens", "travail",
    "monde", "ecole", "etat", "famille", "groupe", "pays", "probleme",
    "main", "partie", "societe", "programme", "question", "gouvernement",
    "nuit", "point", "chambre", "mere", "zone", "argent", "fait", "mois",
    "droit", "etude", "livre", "oeil", "mot", "cote", "tete", "pouvoir",
    "jeu", "ligne", "ville", "communaute", "nom", "president", "equipe",
    "minute", "idee", "corps", "information", "parent", "visage",
    "niveau", "bureau", "porte", "sante", "personne", "art", "guerre",
    "parti", "resultat", "changement", "matin", "raison", "recherche",
    "fille", "moment", "air", "professeur", "force", "education", "pied",
    "age", "politique", "processus", "musique", "marche", "sens",
    "nation", "interet", "mort", "experience", "effet", "classe",
)
ES_WORDS: tuple[str, ...] = (
    "el", "la", "los", "las", "una", "es", "en", "para", "que", "quien",
    "con", "sobre", "mas", "por", "pero", "como", "todo", "nosotros",
    "su", "bien", "sin", "puede", "esta", "hacer", "agua", "montana",
    "casa", "historia", "numero", "gente", "trabajo", "mundo", "escuela",
    "estado", "familia", "grupo", "pais", "problema", "mano", "parte",
    "empresa", "programa", "pregunta", "gobierno", "noche", "punto",
    "cuarto", "madre", "area", "dinero", "hecho", "mes", "derecho",
    "estudio", "libro", "ojo", "palabra", "lado", "cabeza", "poder",
    "juego", "linea", "ciudad", "comunidad", "nombre", "presidente",
    "equipo", "minuto", "idea", "cuerpo", "informacion", "padre",
    "cara", "nivel", "oficina", "puerta", "salud", "persona", "arte",
    "guerra", "partido", "resultado", "cambio", "manana", "razon",
    "investigacion", "chica", "momento", "aire", "maestro", "fuerza",
    "educacion", "pie", "edad", "politica", "proceso", "musica",
    "mercado", "sentido", "nacion", "interes", "muerte", "experiencia",
)

LANG_VOCABS: dict[str, tuple[str, ...]] = {
    "en": EN_WORDS,
    "de": DE_WORDS,
    "fr": FR_WORDS,
    "es": ES_WORDS,
}

# Mild toxicity lexicon for the scrub stage (scrub = transform, not drop).
TOXICITY_LEXICON: tuple[str, ...] = (
    "darn", "heck", "stupid", "idiot", "dumb", "moron", "jerk", "crummy",
)
