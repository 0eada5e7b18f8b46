"""Snowball German stemmer — pure Python, case-preserving.

Re-implements the published Snowball German algorithm
(snowballstem.org/algorithms/german/stemmer.html) at the revision the
reference bundles (c/lib/libstemmer_c/src_c/stem_UTF_8_german.c — no
nis-/syst- rules, which are later Snowball additions). Matches the
compiled bundled stemmer on a 31.6k-word German+mixed-case vocabulary
with zero mismatches (tests/test_snowball_de.py).

Same case discipline as porter2: suffix matching is case-sensitive over
lowercase patterns and the vowel class is lowercase, so all-caps words
pass through; the prelude's U/Y consonant marks are unmarked by the
postlude, which also removes umlauts (ä->a, ö->o, ü->u).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäöü")
_S_ENDING = frozenset("bdfghklmnrt")
_ST_ENDING = frozenset("bdfghklmnt")


def _is_v(c: str) -> bool:
    return c in _VOWELS


def _r_start(w: str, begin: int) -> int:
    for i in range(begin, len(w) - 1):
        if _is_v(w[i]) and not _is_v(w[i + 1]):
            return i + 2
    return len(w)


def stem(word: str) -> str:
    # prelude: ss for ß; mark u/y between vowels as consonant U/Y
    w = word.replace("ß", "ss")
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] == "u" and _is_v(chars[i - 1]) and _is_v(chars[i + 1]):
            chars[i] = "U"
        elif chars[i] == "y" and _is_v(chars[i - 1]) and _is_v(chars[i + 1]):
            chars[i] = "Y"
    w = "".join(chars)

    r1 = _r_start(w, 0)
    r2 = _r_start(w, r1)
    # the region before R1 must contain at least 3 letters
    r1 = max(r1, 3)

    def in_r1(suffix_len: int) -> bool:
        return len(w) - suffix_len >= r1

    def in_r2(suffix_len: int) -> bool:
        return len(w) - suffix_len >= r2

    # step 1: longest of e em en ern er es (R1) | s (R1, valid s-ending)
    for suf in ("ern", "em", "en", "er", "es", "e", "s"):
        if w.endswith(suf):
            if suf == "s":
                if (
                    in_r1(1)
                    and len(w) >= 2
                    and w[-2] in _S_ENDING
                ):
                    w = w[:-1]
            elif in_r1(len(suf)):
                w = w[: -len(suf)]
            break

    # step 2: longest of est en er (R1) | st (R1, valid st-ending with >=3
    # letters before it)
    for suf in ("est", "en", "er", "st"):
        if w.endswith(suf):
            if suf == "st":
                if (
                    in_r1(2)
                    and len(w) >= 6
                    and w[-3] in _ST_ENDING
                ):
                    w = w[:-2]
            elif in_r1(len(suf)):
                w = w[: -len(suf)]
            break

    # step 3: d-suffixes (R2)
    for suf in ("heit", "lich", "isch", "keit", "end", "ung", "ik", "ig"):
        if not w.endswith(suf):
            continue
        if suf in ("end", "ung"):
            if in_r2(len(suf)):
                w = w[: -len(suf)]
                # then: preceding ig (not preceded by e) in R2
                if (
                    w.endswith("ig")
                    and not w.endswith("eig")
                    and in_r2(2)
                ):
                    w = w[:-2]
        elif suf in ("ig", "ik", "isch"):
            if in_r2(len(suf)) and not (
                len(w) > len(suf) and w[-len(suf) - 1] == "e"
            ):
                w = w[: -len(suf)]
        elif suf in ("lich", "heit"):
            if in_r2(len(suf)):
                w = w[: -len(suf)]
                # then: preceding er / en in R1
                for pre in ("er", "en"):
                    if w.endswith(pre) and in_r1(2):
                        w = w[:-2]
                        break
        else:  # keit
            if in_r2(4):
                w = w[:-4]
                # then: preceding lich / ig in R2
                if w.endswith("lich") and in_r2(4):
                    w = w[:-4]
                elif w.endswith("ig") and in_r2(2):
                    w = w[:-2]
        break

    # postlude: unmark U/Y, strip umlauts
    return (
        w.replace("U", "u")
        .replace("Y", "y")
        .replace("ä", "a")
        .replace("ö", "o")
        .replace("ü", "u")
    )
