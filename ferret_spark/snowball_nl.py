"""Snowball Dutch stemmer — pure Python, case-preserving.

Re-implements the published Snowball Dutch algorithm
(snowballstem.org/algorithms/dutch/stemmer.html) at the revision the
reference bundles (c/lib/libstemmer_c/src_c/stem_UTF_8_dutch.c).
Matches the compiled bundled stemmer on a mixed-case vocabulary sweep
with zero mismatches (tests/test_snowball_nl.py)."""

from __future__ import annotations

_V = frozenset("aeiouyè")
_V_J = frozenset("aeiouyèj")

_UMLAUT = str.maketrans("áäéëíïóöúü", "aaeeiioouu")


def _is_v(c: str) -> bool:
    return c in _V


def _prelude(w: str) -> str:
    w = w.translate(_UMLAUT)
    ch = list(w)
    if ch and ch[0] == "y":
        ch[0] = "Y"
    for i in range(1, len(ch)):
        if ch[i] == "y" and ch[i - 1] in _V:
            ch[i] = "Y"
        elif (
            ch[i] == "i"
            and ch[i - 1] in _V
            and i + 1 < len(ch)
            and ch[i + 1] in _V
        ):
            ch[i] = "I"
    return "".join(ch)


def _r1_raw(w: str) -> int:
    for i in range(len(w) - 1):
        if _is_v(w[i]) and not _is_v(w[i + 1]):
            return i + 2
    return len(w)


def _r2(w: str, r1: int) -> int:
    for i in range(r1, len(w) - 1):
        if _is_v(w[i]) and not _is_v(w[i + 1]):
            return i + 2
    return len(w)


def _undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def stem(word: str) -> str:
    w = _prelude(word)
    # R2 derives from the RAW R1; only R1 gets the >=3 anchor
    raw_r1 = _r1_raw(w)
    r2 = _r2(w, raw_r1)
    r1 = max(raw_r1, 3)

    def in_r1(wd, n):
        return len(wd) - n >= r1

    def in_r2(wd, n):
        return len(wd) - n >= r2

    # step 1 (longest among: heden | ene en | se s)
    for suf in ("heden", "ene", "en", "se", "s"):
        if not w.endswith(suf):
            continue
        if suf == "heden":
            if in_r1(w, 5):
                w = w[:-5] + "heid"
        elif suf in ("ene", "en"):
            n = len(suf)
            pre = len(w) - n - 1
            if (
                in_r1(w, n)
                and pre >= 0
                and not _is_v(w[pre])
                and w[pre - 2 : pre + 1] != "gem"
            ):
                w = _undouble(w[:-n])
        else:  # se / s: preceded by non-vowel other than j
            n = len(suf)
            pre = len(w) - n - 1
            if in_r1(w, n) and pre >= 0 and w[pre] not in _V_J:
                w = w[:-n]
        break

    # step 2: final e after a non-vowel, in R1
    e_found = False
    if w.endswith("e") and in_r1(w, 1) and len(w) >= 2 and not _is_v(w[-2]):
        e_found = True
        w = _undouble(w[:-1])

    # step 3a: heid (R2, not preceded by c); then en-ending again
    if w.endswith("heid") and in_r2(w, 4) and w[-5:-4] != "c":
        w = w[:-4]
        pre = len(w) - 3
        if (
            w.endswith("en")
            and in_r1(w, 2)
            and pre >= 0
            and not _is_v(w[pre])
            and w[pre - 2 : pre + 1] != "gem"
        ):
            w = _undouble(w[:-2])

    # step 3b: d-suffixes (longest among)
    for suf in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if not w.endswith(suf):
            continue
        n = len(suf)
        if suf in ("end", "ing"):
            if in_r2(w, n):
                w = w[:-n]
                if (
                    w.endswith("ig")
                    and in_r2(w, 2)
                    and w[-3:-2] != "e"
                ):
                    w = w[:-2]
                else:
                    w = _undouble(w)
        elif suf == "ig":
            if in_r2(w, 2) and w[-3:-2] != "e":
                w = w[:-2]
        elif suf == "lijk":
            if in_r2(w, 4):
                w = w[:-4]
                # repeat step 2
                if (
                    w.endswith("e")
                    and in_r1(w, 1)
                    and len(w) >= 2
                    and not _is_v(w[-2])
                ):
                    w = _undouble(w[:-1])
        elif suf == "baar":
            if in_r2(w, 4):
                w = w[:-4]
        else:  # bar
            if in_r2(w, 3) and e_found:
                w = w[:-3]
        break

    # step 4: undouble vowel — C V V D with D a non-vowel other than I
    if (
        len(w) >= 4
        and not _is_v(w[-4])
        and w[-3] == w[-2]
        and w[-2] in "aeou"
        and not _is_v(w[-1])
        and w[-1] != "I"
    ):
        w = w[:-2] + w[-1]

    return w.translate(str.maketrans("YI", "yi"))
