"""Snowball Italian stemmer — pure Python, case-preserving.

Re-implements the published Snowball Italian algorithm
(snowballstem.org/algorithms/italian/stemmer.html) at the revision the
reference bundles (c/lib/libstemmer_c/src_c/stem_UTF_8_italian.c).
Matches the compiled bundled stemmer on a mixed-case vocabulary sweep
with zero mismatches (tests/test_snowball_it.py)."""

from __future__ import annotations

_V = frozenset("aeiouàèìòù")
_AEIO = frozenset("aeioàèìò")

_PRONOUNS = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "cela", "cele",
    "celi", "celo", "cene", "mela", "mele", "meli", "melo", "mene",
    "sene", "tela", "tele", "teli", "telo", "tene", "vela", "vele",
    "veli", "velo", "vene", "gli", "ci", "la", "le", "li", "lo", "mi",
    "ne", "si", "ti", "vi",
)
_STD_DEL_R2 = (  # case 1
    "atrice", "atrici", "abile", "abili", "ibile", "ibili", "mente",
    "anza", "anze", "ante", "anti", "iche", "ichi", "ismo", "ismi",
    "ista", "iste", "isti", "istà", "istè", "istì", "ica", "ice",
    "ici", "ico", "osa", "ose", "osi", "oso",
)
_STD_AT = ("azione", "azioni", "atore", "atori")  # 2
_STD_LOG = ("logia", "logie")  # 3
_STD_U = ("uzione", "uzioni", "usione", "usioni")  # 4
_STD_ENTE = ("enza", "enze")  # 5
_STD_AMENTO = ("amento", "amenti", "imento", "imenti")  # 6 (RV)
_STD_ITA = ("ità",)  # 8
_STD_IV = ("ivo", "ivi", "iva", "ive")  # 9
_VERB = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
    "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo", "enda",
    "ende", "endi", "endo", "erai", "erei", "Yamo", "iamo", "immo",
    "irai", "irei", "isca", "isce", "isci", "isco", "ano", "are",
    "ata", "ate", "ati", "ato", "ava", "avi", "avo", "erà", "ere",
    "erò", "ete", "eva", "evi", "evo", "irà", "ire", "irò", "ita",
    "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir",
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
    w = w.translate(str.maketrans("áéíóú", "àèìòù")).replace("qu", "qU")
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

    # step 0: attached pronoun
    for pro in _PRONOUNS:
        if not w.endswith(pro):
            continue
        base = w[: -len(pro)]
        for mk, repl in (("ando", None), ("endo", None), ("ar", "e"),
                         ("er", "e"), ("ir", "e")):
            if base.endswith(mk) and len(base) - len(mk) >= rv:
                # ando/endo: delete the pronoun; ar/er/ir: replace the
                # PRONOUN by 'e' (the marker stays — unlike Spanish,
                # bra is not reset to the marker here)
                w = base if repl is None else base + repl
                break
        break

    def standard(w):
        cands = []
        for group, kind in (
            (_STD_DEL_R2, "del"), (_STD_AT, "at"), (_STD_LOG, "log"),
            (_STD_U, "u"), (_STD_ENTE, "ente"), (_STD_AMENTO, "amento"),
            (("amente",), "amente"), (_STD_ITA, "ita"), (_STD_IV, "iv"),
        ):
            for suf in group:
                if w.endswith(suf):
                    cands.append((len(suf), kind, suf))
        if not cands:
            return w, False
        n, kind, suf = max(cands, key=lambda c: c[0])
        if kind == "del":
            if not in_r2(w, n):
                return w, False
            return w[:-n], True
        if kind == "at":
            if not in_r2(w, n):
                return w, False
            w = w[:-n]
            if w.endswith("ic") and in_r2(w, 2):
                w = w[:-2]
            return w, True
        if kind == "log":
            if not in_r2(w, n):
                return w, False
            return w[:-n] + "log", True
        if kind == "u":
            if not in_r2(w, n):
                return w, False
            return w[:-n] + "u", True
        if kind == "ente":
            if not in_r2(w, n):
                return w, False
            return w[:-n] + "ente", True
        if kind == "amento":
            if not in_rv(w, n):
                return w, False
            return w[:-n], True
        if kind == "amente":
            if not in_r1(w, 6):
                return w, False
            w = w[:-6]
            for pre in ("abil", "ic", "os", "iv"):
                if w.endswith(pre) and in_r2(w, len(pre)):
                    iv = pre == "iv"
                    w = w[: -len(pre)]
                    if iv and w.endswith("at") and in_r2(w, 2):
                        w = w[:-2]
                    break
            return w, True
        if kind == "ita":
            if not in_r2(w, n):
                return w, False
            w = w[:-n]
            for pre in ("abil", "ic", "iv"):
                if w.endswith(pre) and in_r2(w, len(pre)):
                    w = w[: -len(pre)]
                    break
            return w, True
        # iv
        if not in_r2(w, n):
            return w, False
        w = w[:-n]
        if w.endswith("at") and in_r2(w, 2):
            w = w[:-2]
            if w.endswith("ic") and in_r2(w, 2):
                w = w[:-2]
        return w, True

    def verb(w):
        cands = [
            (len(s), s) for s in _VERB
            if w.endswith(s) and in_rv(w, len(s))
        ]
        if not cands:
            return w, False
        n, suf = max(cands, key=lambda c: c[0])
        return w[:-n], True

    new_w, ok = standard(w)
    if not ok:
        new_w, ok = verb(new_w)
    w = new_w

    # vowel suffix: final a/e/i/o/à/è/ì/ò in RV, then a preceding i in RV
    if w and w[-1] in _AEIO and in_rv(w, 1):
        w = w[:-1]
        if w.endswith("i") and in_rv(w, 1):
            w = w[:-1]
    # ch/gh -> c/g
    if w.endswith("h") and len(w) >= 2 and w[-2] in "cg" and in_rv(w, 2):
        # the RV check sits on the preceding c/g, not the h itself
        w = w[:-1]

    return w.translate(str.maketrans("IU", "iu"))
