"""Snowball English ("Porter2") stemmer, pure Python.

Implements the published Snowball English stemming algorithm
(snowballstem.org/algorithms/english/stemmer.html) so that tokens stem
identically to the reference engine, which uses
``rust_stemmers::Algorithm::English``
(/root/reference/search/src/engine/preprocessor.rs:12).

This is a from-scratch implementation of the public algorithm spec —
no code is taken from rust-stemmers or the Snowball compiler output.

The implementation is written so it can be vectorised cheaply: `stem()`
is a pure function on a single lowercase token, and
:func:`stem_tokens` maps it over a list with memoisation (Zipfian token
distributions make the cache hit rate very high).
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
# 'Y' marks a consonant-y; it is deliberately NOT in _VOWELS.
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# Exceptional forms applied before the algorithm proper.
_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant forms
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Invariant forms checked after step 1a.
_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"]
)

# step 2 suffix -> replacement; checked longest-first. 'ogi' and 'li'
# carry extra conditions handled inline.
_STEP2 = [
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
    ("ogi", "og"),  # condition: preceded by 'l'
    ("li", ""),  # condition: preceded by a valid li-ending
]

_STEP3 = [
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ative", ""),  # condition: in R2
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
]

_STEP4 = [
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "ion",  # condition: preceded by 's' or 't'
    "al",
    "er",
    "ic",
]


def _is_vowel(ch: str) -> bool:
    return ch in _VOWELS


def _mark_ys(word: str) -> str:
    # y at the start, or y following a vowel, acts as a consonant -> 'Y'.
    if not word:
        return word
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    return "".join(chars)


def _compute_r1(word: str) -> int:
    """Index where R1 starts (== len(word) when R1 is empty)."""
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            return len(prefix)
    for i in range(1, len(word)):
        if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
            return i + 1
    return len(word)


def _compute_r2(word: str, r1: int) -> int:
    for i in range(r1 + 1, len(word)):
        if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
            return i + 1
    return len(word)


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return _is_vowel(word[0]) and not _is_vowel(word[1])
    if n >= 3:
        c1, v, c2 = word[-3], word[-2], word[-1]
        return (
            _is_vowel(v)
            and not _is_vowel(c2)
            and c2 not in "wxY"
            and not _is_vowel(c1)
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _has_vowel(segment: str) -> bool:
    return any(ch in _VOWELS for ch in segment)


@lru_cache(maxsize=1 << 20)
def stem(word: str) -> str:
    """Stem one already-lowercased token (Snowball English / Porter2)."""
    if word.startswith("'"):
        word = word[1:]
    if len(word) <= 2:
        return word
    exc = _EXCEPTIONS1.get(word)
    if exc is not None:
        return exc

    word = _mark_ys(word)
    r1 = _compute_r1(word)
    r2 = _compute_r2(word, r1)

    # Step 0: strip trailing 's / ' / 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith("us") or word.endswith("ss"):
        pass
    elif word.endswith("s"):
        if _has_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # Step 1b
    step1b_done = False
    for suf, repl in (("eedly", "ee"), ("eed", "ee")):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + repl
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _has_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # Step 1c: y/Y -> i when preceded by a non-vowel that isn't the first letter
    if len(word) > 2 and word[-1] in "yY" and not _is_vowel(word[-2]):
        word = word[:-1] + "i"

    # Step 2 (longest suffix; act only if suffix is in R1)
    for suf, repl in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 3 (in R1; 'ative' additionally requires R2)
    for suf, repl in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 4 (in R2)
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l") and len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
        word = word[:-1]

    return word.replace("Y", "y")


def stem_tokens(tokens: list[str]) -> list[str]:
    """Stem a list of lowercase tokens (memoised via lru_cache on stem)."""
    return [stem(t) for t in tokens]
