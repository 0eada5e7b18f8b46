"""Snowball Finnish stemmer — pure Python, case-preserving.

Re-implements the published Snowball Finnish algorithm
(snowballstem.org/algorithms/finnish/stemmer.html) at the revision the
reference bundles (c/lib/libstemmer_c/src_c/stem_UTF_8_finnish.c).
Matches the compiled bundled stemmer on a mixed-case vocabulary sweep
with zero mismatches (tests/test_snowball_fi.py)."""

from __future__ import annotations

_V1 = frozenset("aeiouyäö")
_V2 = frozenset("aeiouäö")
_AEI = frozenset("aeiä")
_PARTICLE_END = _V1 | frozenset("nt")
_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_PARTICLES = ("kaan", "kään", "sti", "han", "hän", "kin", "ko", "kö",
              "pa", "pä")
_POSS_AN = ("lla", "lta", "ssa", "sta", "na", "ta")
_POSS_AEN = ("llä", "ltä", "ssä", "stä", "nä", "tä")
_POSS_EN = ("lle", "ine")
_CASE_PLAIN = (
    "lla", "ssa", "lta", "sta", "lle", "ine",
    "ksi", "llä", "ssä", "ltä", "stä", "na", "ta", "nä", "tä",
)
# these carry among condition-functions: the check runs DURING the
# among match under the R1 limit; on failure a shorter entry may match
_CASE_VI = ("tten", "siin", "den")  # preceded by V2-vowel + i
_CASE_LONG = ("seen",)  # preceded by a long vowel
_CASE_H = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
           "hän": "ä", "hön": "ö"}
_OTHER_PO = ("mpi", "mpa", "mpä", "mmi", "mma", "mmä")
_OTHER_DEL = ("impi", "impa", "impä", "immi", "imma", "immä",
              "eja", "ejä")


def _is_v1(c: str) -> bool:
    return c in _V1


def _r_start(w: str, begin: int) -> int:
    for i in range(begin, len(w) - 1):
        if _is_v1(w[i]) and not _is_v1(w[i + 1]):
            return i + 2
    return len(w)


def stem(word: str) -> str:
    w = word
    r1 = _r_start(w, 0)
    r2 = _r_start(w, r1)

    def fits(wd, n, r):
        return len(wd) - n >= r

    # step 1: particle etc (R1 limit)
    cands = [s for s in _PARTICLES if w.endswith(s) and fits(w, len(s), r1)]
    if cands:
        suf = max(cands, key=len)
        if suf == "sti":
            if fits(w, 3, r2):
                w = w[:-3]
        else:
            # the preceding-char check is NOT R1-limited (the limit is
            # restored before the condition runs)
            pre = len(w) - len(suf) - 1
            if pre >= 0 and w[pre] in _PARTICLE_END:
                w = w[: -len(suf)]

    # step 2: possessive (R1 limit)
    cands = [
        s for s in ("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en")
        if w.endswith(s) and fits(w, len(s), r1)
    ]
    if cands:
        suf = max(cands, key=len)
        if suf == "si":
            if not (len(w) >= 3 and w[-3] == "k"):
                w = w[:-2]
        elif suf == "ni":
            w = w[:-2]
            if w.endswith("kse"):
                w = w[:-3] + "ksi"
        elif suf in ("nsa", "nsä", "mme", "nne"):
            w = w[: -len(suf)]
        elif suf == "an":
            if any(w[:-2].endswith(p) for p in _POSS_AN):
                w = w[:-2]
        elif suf == "än":
            if any(w[:-2].endswith(p) for p in _POSS_AEN):
                w = w[:-2]
        else:  # en
            if any(w[:-2].endswith(p) for p in _POSS_EN):
                w = w[:-2]

    def ends_long(wd):
        return wd.endswith(_LONG)

    # step 3: case ending (R1 limit); sets ending_removed
    ending_removed = False
    def _vi_ok(n):
        # i at >= r1, preceded by a V2 vowel also at >= r1
        i_pos = len(w) - n - 1
        return (
            i_pos - 1 >= r1 - 1
            and i_pos >= r1
            and w[i_pos] == "i"
            and i_pos - 1 >= r1
            and w[i_pos - 1] in _V2
        )

    def _long_ok(n):
        p = len(w) - n
        return p - 2 >= r1 and w[p - 2 : p] in _LONG

    cands = (
        [(len(s), s, "plain") for s in _CASE_PLAIN
         if w.endswith(s) and fits(w, len(s), r1)]
        + [(len(s), s, "plain") for s in _CASE_VI
           if w.endswith(s) and fits(w, len(s), r1) and _vi_ok(len(s))]
        + [(len(s), s, "plain") for s in _CASE_LONG
           if w.endswith(s) and fits(w, len(s), r1) and _long_ok(len(s))]
        + [(len(s), s, "h") for s in _CASE_H
           if w.endswith(s) and fits(w, len(s), r1)]
        + [(3, s, "tta") for s in ("tta", "ttä")
           if w.endswith(s) and fits(w, 3, r1)]
        + [(1, s, "a") for s in ("a", "ä")
           if w.endswith(s) and fits(w, 1, r1)]
        + ([(1, "n", "n")] if w.endswith("n") and fits(w, 1, r1) else [])
    )
    if cands:
        n, suf, kind = max(cands, key=lambda c: c[0])
        if kind == "plain":
            w = w[:-n]
            ending_removed = True
        elif kind == "h":
            if len(w) > n and w[-n - 1] == _CASE_H[suf]:
                w = w[:-n]
                ending_removed = True
        elif kind == "tta":
            if len(w) > 3 and w[-4] == "e":
                w = w[:-3]
                ending_removed = True
        elif kind == "a":
            # preceded by consonant + vowel (reading right to left:
            # vowel immediately before, consonant before that)
            if (
                len(w) >= 3
                and w[-2] in _V1
                and w[-3] not in _V1
            ):
                w = w[:-1]
                ending_removed = True
        else:  # n
            w = w[:-1]
            if ends_long(w) or w.endswith("ie"):
                w = w[:-1]
            ending_removed = True

    # step 4: other endings (R2 limit)
    cands = (
        [(len(s), s, "po") for s in _OTHER_PO
         if w.endswith(s) and fits(w, len(s), r2)]
        + [(len(s), s, "del") for s in _OTHER_DEL
           if w.endswith(s) and fits(w, len(s), r2)]
    )
    if cands:
        n, suf, kind = max(cands, key=lambda c: c[0])
        if kind == "del":
            w = w[:-n]
        elif not w[:-n].endswith("po"):
            w = w[:-n]

    # step 5: plurals
    if ending_removed:
        if w.endswith(("i", "j")) and fits(w, 1, r1):
            w = w[:-1]
    else:
        if (
            w.endswith("t")
            and fits(w, 1, r1)
            and len(w) >= 2
            and w[-2] in _V1
        ):
            w = w[:-1]
            # then, under the R2 limit: mma (not po-preceded) / imma
            if w.endswith("imma") and fits(w, 4, r2):
                w = w[:-4]
            elif (
                w.endswith("mma")
                and fits(w, 3, r2)
                and not w[:-3].endswith("po")
            ):
                w = w[:-3]

    # step 6: tidy — the (a)-(d) checks run under the R1 limit, so the
    # examined PAIR must lie entirely within R1
    if ends_long(w) and fits(w, 2, r1):
        w = w[:-1]
    if (
        len(w) >= 2
        and w[-1] in _AEI
        and w[-2] not in _V1
        and fits(w, 2, r1)
    ):
        w = w[:-1]
    if (w.endswith("oj") or w.endswith("uj")) and fits(w, 2, r1):
        w = w[:-1]
    if w.endswith("jo") and fits(w, 2, r1):
        w = w[:-1]
    # undouble: double consonant followed by zero or more vowels
    i = len(w) - 1
    while i >= 0 and w[i] in _V1:
        i -= 1
    if i >= 1 and w[i] not in _V1 and w[i - 1] == w[i]:
        w = w[:i] + w[i + 1 :]
    return w
