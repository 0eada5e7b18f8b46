"""Snowball Portuguese stemmer — pure Python, case-preserving.

Re-implements the published Snowball Portuguese algorithm
(snowballstem.org/algorithms/portuguese/stemmer.html) at the revision
the reference bundles (c/lib/libstemmer_c/src_c/stem_UTF_8_portuguese.c).
Matches the compiled bundled stemmer on a mixed-case vocabulary sweep
with zero mismatches (tests/test_snowball_pt.py). The prelude rewrites
ã/õ to the two-char markers a~/o~ (the ~ is a consonant for region
computation); the postlude restores them."""

from __future__ import annotations

_V = frozenset("aeiouáâéêíóôú")

_STD_DEL_R2 = (  # case 1
    "amentos", "imentos", "amento", "imento", "adoras", "adores",
    "aço~es", "ismos", "istas", "adora", "aça~o", "antes", "ância",
    "ezas", "icos", "icas", "ismo", "ável", "ível", "ista", "osos",
    "osas", "ador", "ante", "ico", "ica", "oso", "osa", "eza",
)
_STD_LOG = ("logías", "logía")  # 2
_STD_U = ("uciones", "ución")  # 3
_STD_ENTE = ("ências", "ência")  # 4
_STD_IDADE = ("idades", "idade")  # 7
_STD_IV = ("ivas", "ivos", "iva", "ivo")  # 8
_STD_IRA = ("iras", "ira")  # 9
_VERB = (
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis",
    "áramos", "éramos", "íramos", "ávamos", "aremos", "eremos",
    "iremos", "ariam", "eriam", "iriam", "assem", "essem", "issem",
    "ara~o", "era~o", "ira~o", "arias", "erias", "irias", "ardes",
    "erdes", "irdes", "asses", "esses", "isses", "astes", "estes",
    "istes", "areis", "ereis", "ireis", "áreis", "éreis", "íreis",
    "áveis", "íamos", "armos", "ermos", "irmos", "aria", "eria",
    "iria", "asse", "esse", "isse", "aste", "este", "iste", "arei",
    "erei", "irei", "aram", "eram", "iram", "avam", "arem", "erem",
    "irem", "ando", "endo", "indo", "adas", "idas", "arás", "aras",
    "eras", "iras", "avas", "ares", "eres", "ires", "íeis", "ados",
    "idos", "ámos", "amos", "emos", "imos", "erás", "irás", "ada",
    "ida", "ara", "era", "ira", "ava", "iam", "ado", "ido", "ias",
    "ais", "eis", "ia", "ei", "am", "em", "ar", "er", "ir", "as",
    "es", "is", "eu", "iu", "ou", "ará", "erá", "irá",
)
_RESID = ("os", "a", "i", "o", "á", "í", "ó")


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


def stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _rv_start(w)
    r1 = _r_start(w, 0)
    r2 = _r_start(w, r1)

    def in_rv(wd, n):
        return len(wd) - n >= rv

    def in_r1(wd, n):
        return len(wd) - n >= r1

    def in_r2(wd, n):
        return len(wd) - n >= r2

    def standard(w):
        cands = []
        for group, kind in (
            (_STD_DEL_R2, "del"), (_STD_LOG, "log"), (_STD_U, "u"),
            (_STD_ENTE, "ente"), (("amente",), "amente"),
            (("mente",), "mente"), (_STD_IDADE, "idade"),
            (_STD_IV, "iv"), (_STD_IRA, "ira"),
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
        if kind == "amente":
            if not in_r1(w, 6):
                return w, False
            w = w[:-6]
            for pre in ("ic", "ad", "os", "iv"):
                if w.endswith(pre) and in_r2(w, 2):
                    iv = pre == "iv"
                    w = w[:-2]
                    if iv and w.endswith("at") and in_r2(w, 2):
                        w = w[:-2]
                    break
            return w, True
        if kind == "mente":
            if not in_r2(w, 5):
                return w, False
            w = w[:-5]
            for pre in ("ante", "avel", "ível"):
                if w.endswith(pre) and in_r2(w, 4):
                    w = w[:-4]
                    break
            return w, True
        if kind == "idade":
            if not in_r2(w, n):
                return w, False
            w = w[:-n]
            for pre in ("abil", "ic", "iv"):
                if w.endswith(pre) and in_r2(w, len(pre)):
                    w = w[: -len(pre)]
                    break
            return w, True
        if kind == "iv":
            if not in_r2(w, n):
                return w, False
            w = w[:-n]
            if w.endswith("at") and in_r2(w, 2):
                w = w[:-2]
            return w, True
        # ira / iras -> ir when preceded by e, in RV
        if not in_rv(w, n):
            return w, False
        if w[:-n].endswith("e"):
            return w[:-n] + "ir", True
        return w, False

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
    if ok:
        w = new_w
        # then: i preceded by c, in RV -> delete
        if w.endswith("i") and len(w) >= 2 and w[-2] == "c" and in_rv(w, 1):
            w = w[:-1]
    else:
        w = new_w
        for suf in _RESID:
            if w.endswith(suf):
                if in_rv(w, len(suf)):
                    w = w[: -len(suf)]
                break

    # residual form (always)
    if w.endswith(("e", "é", "ê")):
        if in_rv(w, 1):
            w = w[:-1]
            if (
                (w.endswith("gu") and in_rv(w, 1))
                or (w.endswith("ci") and in_rv(w, 1))
            ):
                w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")
