"""Porter2 (Snowball English) stemmer — pure-Python, case-preserving.

Reference parity: the reference's StemFilter wraps libstemmer's Snowball
English stemmer (c/src/analysis.c:1403-1485; generated algorithm in
c/lib/libstemmer_c/src_c/stem_UTF_8_english.c, from the public Snowball
spec, snowballstem.org/algorithms/english/stemmer.html). This module
re-implements the published algorithm from the spec — it is not a
translation of the generated code — and matches the bundled stemmer's
behavior on a 28k-word mixed-case vocabulary (tests/test_porter2.py).

Key behavioral points (verified against the compiled reference stemmer):
 - suffix matching is case-sensitive over lowercase patterns, and the
   vowel class is lowercase ``aeiouy`` — so all-caps words like
   ``DEBATED`` pass through unchanged while ``DEBating`` -> ``DEBate``
   (the tc_token_stream.rb:467-471 case-preserving goldens);
 - step 1c rewrites both ``y`` and ``Y``; the final Y->y postlude runs
   only when the prelude itself marked a lowercase y (input capital Ys
   survive: ``toY`` -> ``toY``);
 - R1 starts after ``gener``/``commun``/``arsen`` prefixes;
 - the exception lists (skis, dying, news, inning, ...) apply to the
   exact lowercase forms only.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
# w, x and the internal Y marker never end a short syllable
_WXY = frozenset("wxY")
_VALID_LI = frozenset("cdeghkmnrt")

_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTION2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

_STEP2 = [
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", None), ("li", None),
]
_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", None),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
]
_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
]


def _is_vowel(c: str) -> bool:
    return c in _VOWELS


def _r1_start(w: str) -> int:
    """R1 = region after the first vowel followed by a non-vowel; special
    prefixes gener-/commun-/arsen- anchor R1 right after the prefix."""
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            return len(pre)
    for i in range(len(w) - 1):
        if _is_vowel(w[i]) and not _is_vowel(w[i + 1]):
            return i + 2
    return len(w)


def _r_start(w: str, begin: int) -> int:
    for i in range(begin, len(w) - 1):
        if _is_vowel(w[i]) and not _is_vowel(w[i + 1]):
            return i + 2
    return len(w)


def _ends_short_syllable(w: str) -> bool:
    """(a) non-vowel + vowel + non-vowel(not w/x/Y) at the end, or
    (b) word is vowel + non-vowel."""
    n = len(w)
    if n == 2:
        return _is_vowel(w[0]) and not _is_vowel(w[1])
    if n >= 3:
        return (
            not _is_vowel(w[-3])
            and _is_vowel(w[-2])
            and not _is_vowel(w[-1])
            and w[-1] not in _WXY
        )
    return False


def _has_vowel(s: str) -> bool:
    return any(_is_vowel(c) for c in s)


def stem(word: str) -> str:
    if len(word) <= 2:
        return word

    w = word
    if w[0] == "'":
        w = w[1:]
    ex = _EXCEPTION1.get(w)
    if ex is not None:
        return ex

    # prelude: mark consonant-y as Y (only these Ys are unmarked at the end)
    y_found = False
    if w and w[0] == "y":
        w = "Y" + w[1:]
        y_found = True
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] == "y" and _is_vowel(chars[i - 1]):
            chars[i] = "Y"
            y_found = True
    w = "".join(chars)

    r1 = _r1_start(w)
    r2 = _r_start(w, r1)

    def in_r1(suffix_len: int) -> bool:
        return len(w) - suffix_len >= r1

    def in_r2(suffix_len: int) -> bool:
        return len(w) - suffix_len >= r2

    # step 0: strip 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if _has_vowel(w[:-2]):
            w = w[:-1]

    if w in _EXCEPTION2:
        return w

    # step 1b
    if w.endswith("eedly"):
        if in_r1(5):
            w = w[:-3]
    elif w.endswith("eed"):
        if in_r1(3):
            w = w[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem_ = w[: -len(suf)]
                if _has_vowel(stem_):
                    w = stem_
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif (
                        len(w) >= 2
                        and w[-1] == w[-2]
                        and w[-1] in "bdfgmnprt"
                    ):
                        w = w[:-1]
                    elif len(w) == r1 and _ends_short_syllable(w):
                        w += "e"
                break

    # step 1c: y/Y -> i after a non-vowel that is not the first letter
    if (
        len(w) > 2
        and w[-1] in ("y", "Y")
        and not _is_vowel(w[-2])
    ):
        w = w[:-1] + "i"

    # step 2 (suffix must lie in R1)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if in_r1(len(suf)):
                if suf == "ogi":
                    if len(w) > 3 and w[-4] == "l":
                        w = w[:-1]
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _VALID_LI:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 3 (suffix in R1; 'ative' requires R2)
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if in_r1(len(suf)):
                if suf == "ative":
                    if in_r2(5):
                        w = w[:-5]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 4 (suffix in R2; 'ion' only after s/t)
    for suf in _STEP4:
        if w.endswith(suf):
            if in_r2(len(suf)):
                if suf == "ion":
                    if len(w) > 3 and w[-4] in ("s", "t"):
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # step 5
    if w.endswith("e"):
        if in_r2(1) or (in_r1(1) and not _ends_short_syllable(w[:-1])):
            w = w[:-1]
    elif w.endswith("l") and in_r2(1) and len(w) >= 2 and w[-2] == "l":
        w = w[:-1]

    # postlude: unmark Ys (only when the prelude marked one — input
    # capital Ys are untouched otherwise)
    if y_found:
        w = w.replace("Y", "y")
    return w
