"""Snowball Danish / Norwegian / Swedish stemmers — pure Python.

Re-implement the published Snowball algorithms for the three
Scandinavian languages at the revision the reference bundles
(c/lib/libstemmer_c/src_c/stem_UTF_8_{danish,norwegian,swedish}.c).
Each matches the compiled bundled stemmer on a mixed-case vocabulary
sweep with zero mismatches (tests/test_snowball_scand.py).

Shared shape: R1 anchored at >=3 letters, a main-suffix among limited
to R1 (longest suffix that FITS R1 wins), an s-ending rule whose
preceding-character check is NOT R1-limited, a consonant-pair
undoubling step, and a small other-suffix step."""

from __future__ import annotations

_V_DA = frozenset("aeiouyåæø")
_V_NO = frozenset("aeiouyåæø")
_V_SV = frozenset("aeiouyäåö")

_S_END_DA = frozenset("abcdfghjklmnoprtvyzå")
_S_END_NO = frozenset("bcdfghjlmnoprtvyz")
_S_END_SV = frozenset("bcdfghjklmnoprtvy")

_MAIN_DA = (
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder",
    "endes", "ernes", "erens", "erets", "ered", "ende", "erne", "eren",
    "erer", "heds", "enes", "eres", "eret", "hed", "ene", "ere", "ens",
    "ers", "ets", "en", "er", "es", "et", "e",
)
_MAIN_NO = (
    "hetenes", "hetene", "hetens", "heten", "heter", "endes", "ande",
    "ende", "edes", "enes", "erte", "ede", "ane", "ene", "ens", "ers",
    "ets", "het", "ast", "ert", "en", "ar", "er", "as", "es", "et",
    "a", "e", "s",
)
_MAIN_SV = (
    "heterna", "hetens", "anden", "heten", "heter", "arnas", "ernas",
    "ornas", "andes", "arens", "arna", "erna", "orna", "ande", "arne",
    "aste", "aren", "ades", "erns", "andet", "ern", "are", "ade", "at",
    "het", "ast", "ad", "en", "ar", "er", "or", "as", "es", "ens",
    "e", "s", "a",
)
_PAIRS_DA = ("gd", "dt", "gt", "kt")
_PAIRS_NO = ("dt", "vt")
_PAIRS_SV = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


def _r1_min3(w: str, vowels) -> int:
    r1 = len(w)
    for i in range(len(w) - 1):
        if w[i] in vowels and w[i + 1] not in vowels:
            r1 = i + 2
            break
    return max(r1, 3)


def _main_suffix(w, r1, table, s_ending, erte_to_er=False):
    """Longest suffix that fits inside R1. 's' needs a valid s-ending
    char before it (check not R1-limited). Norwegian erte/ert -> er."""
    cands = [
        s for s in table if w.endswith(s) and len(w) - len(s) >= r1
    ]
    if not cands:
        return w
    suf = max(cands, key=len)
    if suf == "s":
        if len(w) >= 2 and w[-2] in s_ending:
            return w[:-1]
        return w
    if erte_to_er and suf in ("erte", "ert"):
        return w[: -len(suf)] + "er"
    return w[: -len(suf)]


def _consonant_pair(w, r1, pairs):
    """Remove the last letter when the word ends with one of the pairs
    and the pair lies in R1."""
    if w.endswith(pairs) and len(w) - 2 >= r1:
        return w[:-1]
    return w


def stem_danish(word: str) -> str:
    w = word
    r1 = _r1_min3(w, _V_DA)
    w = _main_suffix(w, r1, _MAIN_DA + ("s",), _S_END_DA)
    w = _consonant_pair(w, r1, _PAIRS_DA)
    # other suffix: igst -> remove st (no R1 condition on the st itself)
    if w.endswith("igst"):
        w = w[:-2]
    cands = [
        s for s in ("elig", "løst", "lig", "els", "ig")
        if w.endswith(s) and len(w) - len(s) >= r1
    ]
    if cands:
        suf = max(cands, key=len)
        if suf == "løst":
            w = w[:-1]
        else:
            w = w[: -len(suf)]
            w = _consonant_pair(w, r1, _PAIRS_DA)
    # undouble: final double consonant in R1 -> drop one
    if (
        len(w) >= 2
        and w[-1] == w[-2]
        and w[-1] not in _V_DA
        and len(w) - 1 >= r1
    ):
        w = w[:-1]
    return w


def stem_norwegian(word: str) -> str:
    w = word
    r1 = _r1_min3(w, _V_NO)
    # main: 's' deletes after a valid ending OR after k preceded by a
    # non-vowel
    cands = [
        s for s in _MAIN_NO if w.endswith(s) and len(w) - len(s) >= r1
    ]
    if cands:
        suf = max(cands, key=len)
        if suf == "s":
            ok = len(w) >= 2 and (
                w[-2] in _S_END_NO
                or (w[-2] == "k" and len(w) >= 3 and w[-3] not in _V_NO)
            )
            if ok:
                w = w[:-1]
        elif suf in ("erte", "ert"):
            w = w[: -len(suf)] + "er"
        else:
            w = w[: -len(suf)]
    w = _consonant_pair(w, r1, _PAIRS_NO)
    cands = [
        s for s in ("hetslov", "eleg", "elig", "elov", "slov", "leg",
                    "eig", "lig", "els", "lov", "ig")
        if w.endswith(s) and len(w) - len(s) >= r1
    ]
    if cands:
        w = w[: -len(max(cands, key=len))]
    return w


def stem_swedish(word: str) -> str:
    w = word
    r1 = _r1_min3(w, _V_SV)
    w = _main_suffix(w, r1, _MAIN_SV, _S_END_SV)
    w = _consonant_pair(w, r1, _PAIRS_SV)
    cands = [
        s for s in ("fullt", "löst", "lig", "els", "ig")
        if w.endswith(s) and len(w) - len(s) >= r1
    ]
    if cands:
        suf = max(cands, key=len)
        if suf == "fullt" or suf == "löst":
            w = w[:-1]
        else:
            w = w[: -len(suf)]
    return w
