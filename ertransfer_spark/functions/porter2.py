"""Vendored Porter2 (Snowball English) stemmer — pure Python, no deps.

The reference stems with ``nltk.SnowballStemmer('english')``
(splitters/KNN-Join/splitter.py:16-19); nltk is not in this image, so this
module implements the PUBLIC Porter2 algorithm (snowballstem.org English
stemmer specification) from scratch. It is the reference-parity stemmer for
``clean=True`` paths; the engine's default JVM-side suffix-stripper
(functions/text.stem_tokens) remains the oracle-shared fast path, with the
token-level divergence between the two quantified in SURVEY §8.

Exposed as:
- :func:`stem` — one lowercase word → its stem (driver-side / tests);
- :func:`snowball_stem_tokens` — Arrow-batched pandas UDF over a token
  array column (the distributed path; per-batch memoization makes the
  Python cost ~one dict lookup per token occurrence).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)

_STEP2_SUFFIXES = [
    # (suffix, replacement) — scanned longest-first; special-cased: ogi, li
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
]

_STEP3_SUFFIXES = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", ""), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
]

_STEP4_SUFFIXES = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
]


def _regions(word: str) -> tuple[int, int]:
    """R1/R2 start positions. 'y' here is already consonant-marked as 'Y',
    so membership in _VOWELS ('aeiouy') is the correct vowel test: a
    remaining lowercase 'y' IS a vowel occurrence."""
    n = len(word)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """(a) non-vowel + vowel + non-vowel(≠ w,x,Y) at the end, or
    (b) the word is exactly vowel + non-vowel."""
    n = len(word)
    if n == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if n >= 3:
        c1, c2, c3 = word[-3], word[-2], word[-1]
        return (
            c1 not in _VOWELS
            and c2 in _VOWELS
            and c3 not in _VOWELS
            and c3 not in "wxY"
        )
    return False


def stem(word: str) -> str:  # noqa: C901 — the algorithm is one long spec
    """Porter2 stem of a lowercase word (non-alpha input returned as-is)."""
    word = word.lower()
    if word and word[0] == "'":
        word = word[1:]
    if word in _EXCEPTIONS1:
        return _EXCEPTIONS1[word]
    if len(word) <= 2:
        return word

    # consonant-mark y: initial y, or y after a vowel
    if word[0] == "y":
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _regions(word)

    # step 0: longest of ' , 's , 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith("ss") or word.endswith("us"):
        pass
    elif word.endswith("s"):
        if any(c in _VOWELS for c in word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # step 1b
    step1b_done = False
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + "ee"
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if any(c in _VOWELS for c in stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        word += "e"
                break

    # step 1c: y/Y → i after a non-vowel that is not the first letter
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # step 2 (longest suffix, must sit in R1)
    for suf, rep in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 3 (longest suffix in R1; 'ative' additionally needs R2)
    for suf, rep in _STEP3_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 4 (longest suffix in R2; 'ion' needs preceding s/t)
    for suf in _STEP4_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


def snowball_stem_tokens(tokens_col):
    """Arrow-batched pandas UDF: array<string> tokens → Porter2 stems.

    The per-batch memo dict collapses the Python cost to ~one dict lookup
    per token occurrence (natural-language token frequency is Zipfian, so
    the distinct-token set per batch is small). This is the slow-path
    reference-parity stemmer; the JVM-side functions/text.stem_tokens is
    the default."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    # no type hints: pd is a local import, so string annotations would not
    # resolve for pyspark's hint inference — the no-hint form is a scalar
    # Series→Series pandas UDF by construction
    @F.pandas_udf(ArrayType(StringType()))
    def _stem_arr(s):
        memo: dict[str, str] = {}

        def one(arr):
            if arr is None:
                return None
            out = []
            for t in arr:
                v = memo.get(t)
                if v is None:
                    v = stem(t)
                    memo[t] = v
                out.append(v)
            return out

        return s.map(one)

    return _stem_arr(tokens_col)
