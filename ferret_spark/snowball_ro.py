"""Snowball Romanian stemmer — pure Python, case-preserving.

Re-implements the published Snowball Romanian algorithm
(snowballstem.org/algorithms/romanian/stemmer.html) at the revision the
reference bundles (c/lib/libstemmer_c/src_c/stem_UTF_8_romanian.c, with
the cedilla forms ş/ţ the bundled version uses). Matches the compiled
bundled stemmer on a mixed-case vocabulary sweep with zero mismatches
(tests/test_snowball_ro.py)."""

from __future__ import annotations

_V = frozenset("aeiouâăî")

# step 0 (R1): suffix -> replacement (None = delete, "FAIL_AB" = the
# ile->i rule that fails outright when preceded by ab)
_STEP0 = (
    ("iilor", "i"), ("ilor", "i"), ("aţia", "aţi"), ("aţie", "aţi"),
    ("elor", "e"), ("iile", "i"), ("atei", "at"), ("ului", None),
    ("aua", "a"), ("iua", "i"), ("ele", "e"), ("ile", "ABi"),
    ("iei", "i"), ("ea", "e"), ("ii", "i"), ("ul", None),
)
# combo step (R1, repeated): suffix -> replacement
_COMBO = (
    ("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
    ("abilităţi", "abil"), ("ibilitate", "ibil"), ("ivitate", "iv"),
    ("ivitati", "iv"), ("ivităi", "iv"), ("ivităţi", "iv"),
    ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
    ("icităţi", "ic"), ("icatori", "ic"), ("icator", "ic"),
    ("icala", "ic"), ("icale", "ic"), ("icali", "ic"), ("icală", "ic"),
    ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"), ("icivă", "ic"),
    ("ical", "ic"), ("iciv", "ic"),
    ("aţiune", "at"), ("atoare", "at"), ("ătoare", "at"),
    ("ativa", "at"), ("ative", "at"), ("ativi", "at"), ("ativă", "at"),
    ("atori", "at"), ("ători", "at"), ("ativ", "at"), ("ator", "at"),
    ("ător", "at"),
    ("iţiune", "it"), ("itoare", "it"), ("itiva", "it"), ("itive", "it"),
    ("itivi", "it"), ("itivă", "it"), ("itori", "it"), ("itiv", "it"),
    ("itor", "it"),
)
_STD_DEL = (
    "abila", "abile", "abili", "abilă", "ibila", "ibile", "ibili",
    "ibilă", "atori", "itate", "itati", "ităţi", "abil", "ibil",
    "oasa", "oasă", "oase", "anta", "ante", "anti", "antă", "ator",
    "ităi", "ica", "ice", "ici", "ică", "ata", "ată", "ati", "ate",
    "uta", "ută", "uti", "ute", "ita", "ită", "iti", "ite", "iva",
    "ive", "ivi", "ivă", "osi", "oşi", "ant", "at",
    "ic", "it", "ut", "iv", "os",
)
_STD_IST = ("işti", "ista", "iste", "isti", "istă", "isme", "ist", "ism")
_VERB_CU = (  # delete if preceded by consonant or u (within RV)
    "ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire", "âre",
    "ase", "ise", "use", "âse", "eşte", "ăşte", "eze", "ai", "eai",
    "iai", "eşti", "ăşti", "ui", "ezi", "aşi", "aseşi", "iseşi",
    "useşi", "âseşi", "işi", "uşi", "âşi", "âi", "eaţi", "iaţi",
    "arăţi", "aserăţi", "iserăţi", "userăţi", "âserăţi", "irăţi",
    "urăţi", "ârăţi", "am", "eam", "iam", "asem", "isem", "usem",
    "âsem", "arăm", "aserăm", "iserăm", "userăm", "âserăm", "irăm",
    "urăm", "ârăm", "au", "eau", "iau", "indu", "ându", "ez", "ească",
    "ară", "aseră", "iseră", "useră", "âseră", "iră", "ură", "âră",
    "ează",
)
_VERB_DEL = (  # plain delete (within RV)
    "seserăţi", "seserăm", "serăţi", "serăm", "sesem", "seseşi",
    "seseră", "sese", "seşi", "sei", "seră", "se", "aţi", "eţi",
    "iţi", "âţi", "em", "im", "ăm", "âm",
)


def _is_v(c: str) -> bool:
    return c in _V


def _r_start(w: str, begin: int) -> int:
    for i in range(begin, len(w) - 1):
        if _is_v(w[i]) and not _is_v(w[i + 1]):
            return i + 2
    return len(w)


def _rv_start(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if not _is_v(w[1]):
        for i in range(2, n):
            if _is_v(w[i]):
                return i + 1
        return n
    if _is_v(w[0]):
        for i in range(2, n):
            if not _is_v(w[i]):
                return i + 1
        return n
    return 3


def _prelude(w: str) -> str:
    ch = list(w)
    for i in range(1, len(ch) - 1):
        if ch[i] == "u" and ch[i - 1] in _V and ch[i + 1] in _V:
            ch[i] = "U"
        elif ch[i] == "i" and ch[i - 1] in _V and ch[i + 1] in _V:
            ch[i] = "I"
    return "".join(ch)


def stem(word: str) -> str:
    w = _prelude(word)
    rv = _rv_start(w)
    r1 = _r_start(w, 0)
    r2 = _r_start(w, r1)

    def in_rv(wd, n):
        return len(wd) - n >= rv

    def in_r1(wd, n):
        return len(wd) - n >= r1

    def in_r2(wd, n):
        return len(wd) - n >= r2

    # step 0 (single longest-match among, R1; condition fail = step fails)
    cands = [(len(s), s, rep) for s, rep in _STEP0 if w.endswith(s)]
    if cands:
        n, suf, rep = max(cands, key=lambda c: c[0])
        if in_r1(w, n):
            if rep == "ABi":
                if not w[:-n].endswith("ab"):
                    w = w[:-n] + "i"
            elif rep is None:
                w = w[:-n]
            else:
                w = w[:-n] + rep

    # standard: repeat combo (R1), then a_3 among (R2); flag tracks any
    # removal by combo or standard
    flag = False
    while True:
        cands = [(len(s), s, rep) for s, rep in _COMBO if w.endswith(s)]
        if not cands:
            break
        n, suf, rep = max(cands, key=lambda c: c[0])
        if not in_r1(w, n):
            break
        w = w[:-n] + rep
        flag = True

    cands = (
        [(len(s), s, "del") for s in _STD_DEL if w.endswith(s)]
        + [(len(s), s, "ist") for s in _STD_IST if w.endswith(s)]
        + (
            [(4, "iune", "tiune"), (4, "iuni", "tiune")]
            if w.endswith(("ţiune", "ţiuni"))
            else []
        )
    )
    if cands:
        n, suf, rep = max(cands, key=lambda c: c[0])
        if in_r2(w, n):
            if rep == "del":
                w = w[:-n]
            elif rep == "ist":
                w = w[:-n] + "ist"
            else:  # ţiune/ţiuni -> ţ becomes t
                w = w[: -n - 1] + "t"
            flag = True

    if not flag:
        # verb suffixes, everything within RV
        cands = [
            (len(s), s, "cu") for s in _VERB_CU
            if w.endswith(s) and in_rv(w, len(s))
        ] + [
            (len(s), s, "del") for s in _VERB_DEL
            if w.endswith(s) and in_rv(w, len(s))
        ]
        if cands:
            n, suf, kind = max(cands, key=lambda c: c[0])
            if kind == "del":
                w = w[:-n]
            else:
                pre = len(w) - n - 1
                if pre >= rv and (not _is_v(w[pre]) or w[pre] == "u"):
                    w = w[:-n]

    # vowel suffix (RV)
    for s in ("ie", "a", "e", "i", "ă"):
        if w.endswith(s):
            if in_rv(w, len(s)):
                w = w[: -len(s)]
            break

    return w.translate(str.maketrans("IU", "iu"))
