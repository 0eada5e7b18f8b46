"""Snowball Hungarian stemmer — pure Python, case-preserving.

Re-implements the published Snowball Hungarian algorithm
(snowballstem.org/algorithms/hungarian/stemmer.html) at the revision
the reference bundles (c/lib/libstemmer_c/src_c/stem_UTF_8_hungarian.c
— which spells the long o/u umlauts as õ/û rather than the modern
ő/ű). Matches the compiled bundled stemmer on a mixed-case vocabulary
sweep with zero mismatches (tests/test_snowball_hu.py)."""

from __future__ import annotations

_V = frozenset("aeiouáéíóõöúûü")
_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_DOUBLES = ("ccs", "zzs", "ggy", "lly", "nny", "tty", "ssz", "bb", "cc",
            "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp", "rr",
            "ss", "tt", "vv", "zz")
_CASES = (
    "anként", "enként", "onként", "képpen", "ként", "képp", "ban",
    "ben", "nak", "nek", "val", "vel", "nál", "nél", "ból", "ról",
    "tól", "bõl", "rõl", "tõl", "hez", "hoz", "höz", "ért", "kor",
    "ba", "ra", "be", "re", "ig", "ul", "ül", "an", "en", "on", "ön",
    "at", "et", "ot", "öt", "vá", "vé", "n", "t",
)
# (suffix, replacement or None) tables; longest-first matching
_CASE_SPECIAL = (("ánként", "a"), ("án", "a"), ("én", "e"))
_CASE_OTHER = (("astul", None), ("estül", None), ("ástul", "a"),
               ("éstül", "e"), ("stul", None), ("stül", None))
_PLURAL = (("ák", "a"), ("ék", "e"), ("ök", None), ("ok", None),
           ("ek", None), ("ak", None), ("k", None))
_OWNED = (
    ("áéi", "a"), ("ééi", "e"), ("aké", None), ("eké", None),
    ("oké", None), ("öké", None), ("áké", "a"), ("éké", "e"),
    ("ké", None), ("éi", None), ("éé", "e"), ("é", None),
)
_SING_OWNER = (
    ("ájuk", "a"), ("éjük", "e"), ("unk", None), ("ünk", None),
    ("ánk", "a"), ("énk", "e"), ("juk", None), ("jük", None),
    ("nk", None), ("uk", None), ("ük", None), ("am", None),
    ("em", None), ("om", None), ("ám", "a"), ("ém", "e"),
    ("ad", None), ("ed", None), ("od", None), ("öd", None),
    ("ád", "a"), ("éd", "e"), ("ja", None), ("je", None),
    ("m", None), ("d", None), ("a", None), ("e", None), ("o", None),
    ("á", "a"), ("é", "e"),
)
_PLUR_OWNER = (
    ("jaink", None), ("jeink", None), ("jaitok", None),
    ("jeitek", None), ("aitok", None), ("eitek", None),
    ("áitok", "a"), ("éitek", "e"), ("itek", None), ("jaim", None),
    ("jeim", None), ("jaid", None), ("jeid", None), ("aink", None),
    ("eink", None), ("áink", "a"), ("éink", "e"), ("jaik", None),
    ("jeik", None), ("áim", "a"), ("éim", "e"), ("aim", None),
    ("eim", None), ("áid", "a"), ("éid", "e"), ("aid", None),
    ("eid", None), ("áik", "a"), ("éik", "e"), ("aik", None),
    ("eik", None), ("jai", None), ("jei", None), ("ink", None),
    ("ái", "a"), ("éi", "e"), ("ai", None), ("ei", None),
    ("im", None), ("id", None), ("ik", None), ("i", None),
)


def _r1_start(w: str) -> int:
    if not w:
        return 0
    if w[0] in _V:
        # after the first consonant (or consonant digraph)
        i = 1
        while i < len(w) and w[i] in _V:
            i += 1
        if i >= len(w):
            return len(w)
        for d in _DIGRAPHS:
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    # begins with a consonant: after the first vowel
    for i in range(1, len(w)):
        if w[i] in _V:
            return i + 1
    return len(w)


def stem(word: str) -> str:
    w = word
    r1 = _r1_start(w)

    def in_r1(wd, n):
        return len(wd) - n >= r1

    def v_ending(wd):
        if wd.endswith("á") and in_r1(wd, 1):
            return wd[:-1] + "a"
        if wd.endswith("é") and in_r1(wd, 1):
            return wd[:-1] + "e"
        return wd

    def ends_double(wd):
        return wd.endswith(_DOUBLES)

    def apply_table(wd, table):
        """Among semantics: the LONGEST matching suffix wins before the
        R1 check runs; if R1 fails for it, the whole step does nothing
        (no shorter-suffix retry)."""
        cands = [(len(s), s, rep) for s, rep in table if wd.endswith(s)]
        if not cands:
            return wd, False
        n, s, rep = max(cands, key=lambda c: c[0])
        if not in_r1(wd, n):
            return wd, False
        return wd[:-n] + (rep or ""), True

    def undouble(wd):
        # drop the first letter of the final doubled pair: tt -> t,
        # ssz -> sz (the 3-char doubled digraphs lose their middle char)
        return wd[:-2] + wd[-1]

    # instrumental: al/el in R1, preceded by a double consonant;
    # delete then undouble
    for suf in ("al", "el"):
        if w.endswith(suf):
            if in_r1(w, 2) and ends_double(w[:-2]):
                w = undouble(w[:-2])
            break

    # case ending, then v_ending (longest match first, then R1)
    cands = [(len(s), s) for s in _CASES if w.endswith(s)]
    if cands:
        n, suf = max(cands, key=lambda c: c[0])
        if in_r1(w, n):
            w = v_ending(w[:-n])

    w, _ = apply_table(w, _CASE_SPECIAL)
    w, _ = apply_table(w, _CASE_OTHER)

    # factive: á/é in R1 preceded by double consonant; delete + undouble
    for suf in ("á", "é"):
        if w.endswith(suf):
            if in_r1(w, 1) and ends_double(w[:-1]):
                w = undouble(w[:-1])
            break

    w, _ = apply_table(w, _OWNED)
    w, _ = apply_table(w, _SING_OWNER)
    w, _ = apply_table(w, _PLUR_OWNER)
    w, _ = apply_table(w, _PLURAL)
    return w
