"""Snowball French stemmer — pure Python, case-preserving.

Re-implements the published Snowball French algorithm
(snowballstem.org/algorithms/french/stemmer.html) at the revision the
reference bundles (c/lib/libstemmer_c/src_c/stem_UTF_8_french.c).
Matches the compiled bundled stemmer on a mixed French/English
mixed-case vocabulary with zero mismatches (tests/test_snowball_fr.py).

Notable faithful quirks: the amment/emment/ment(s) branches of the
standard-suffix step EDIT the word and then signal failure, so the verb
and residual steps still run on the edited word (Snowball ``fail``);
the postlude lowercases every capital I/U/Y, not just the prelude's
consonant marks.
"""

from __future__ import annotations

_V = frozenset("aeiouyàâèéêëîïôùû")
_KEEP_WITH_S = frozenset("aiouès")

_STD_DEL_R2 = (  # case 1
    "iqUes", "ances", "ables", "ismes", "istes", "iqUe", "ance",
    "able", "isme", "iste", "eux",
)
_STD_AT = ("atrices", "ations", "ateurs", "atrice", "ation", "ateur")  # 2
_STD_LOG = ("logies", "logie")  # 3
_STD_U = ("usions", "utions", "usion", "ution")  # 4
_STD_ENT = ("ences", "ence")  # 5
_STD_EMENT = ("ements", "ement")  # 6
_STD_ITE = ("ités", "ité")  # 7
_STD_IF = ("ives", "ifs", "ive", "if")  # 8
_STD_ISSEMENT = ("issements", "issement")  # 12

_I_VERB = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "îmes", "îtes", "irai", "iras", "irez", "isse", "ies",
    "ira", "ir", "ie", "is", "it", "ît", "i",
)
_VERB_IONS = ("ions",)  # case 1: R2
_VERB_RV = (  # case 2: delete
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é",
)
_VERB_E = (  # case 3: delete, then try preceding 'e' (in RV) deletion
    "assions", "assent", "assiez", "aIent", "antes", "asses", "âmes",
    "âtes", "ante", "ants", "asse", "ais", "ait", "ant", "ât", "ai",
    "as", "a",
)
_RESID = (
    ("Ière", "i"), ("ière", "i"), ("Ier", "i"), ("ier", "i"),
    ("ion", None), ("e", ""), ("ë", None),
)
_DOUBLES = ("eill", "enn", "onn", "ett", "ell")


def _is_v(c: str) -> bool:
    return c in _V


def _r_start(w: str, begin: int) -> int:
    for i in range(begin, len(w) - 1):
        if _is_v(w[i]) and not _is_v(w[i + 1]):
            return i + 2
    return len(w)


def _rv_start(w: str) -> int:
    n = len(w)
    if n >= 2 and _is_v(w[0]) and _is_v(w[1]):
        return min(3, n)
    if w[:3] in ("par", "col", "tap"):
        return 3
    # region after the first vowel not at the start
    for i in range(1, n):
        if _is_v(w[i]):
            return i + 1
    return n


def _prelude(w: str) -> str:
    ch = list(w)
    i = 0
    while i < len(ch):
        c = ch[i]
        if c in _V and i + 1 < len(ch):
            n = ch[i + 1]
            if n == "u" and i + 2 < len(ch) and ch[i + 2] in _V:
                ch[i + 1] = "U"
                continue
            if n == "i" and i + 2 < len(ch) and ch[i + 2] in _V:
                ch[i + 1] = "I"
                continue
            if n == "y":
                ch[i + 1] = "Y"
                continue
        if c == "y" and i + 1 < len(ch) and ch[i + 1] in _V:
            ch[i] = "Y"
            i += 1
            continue
        if c == "q" and i + 1 < len(ch) and ch[i + 1] == "u":
            ch[i + 1] = "U"
            i += 2
            continue
        i += 1
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

    def standard(w):
        """Returns (new_w, success). The amment/emment/ment branches edit
        then FAIL (Snowball `fail`), letting the verb steps run after."""
        cands = []
        for group, kind in (
            (_STD_DEL_R2, "del"), (_STD_AT, "at"), (_STD_LOG, "log"),
            (_STD_U, "u"), (_STD_ENT, "ent"), (_STD_EMENT, "ement"),
            (_STD_ITE, "ite"), (_STD_IF, "if"), (("eaux",), "eaux"),
            (("aux",), "aux"), (("euses", "euse"), "euse"),
            (_STD_ISSEMENT, "issement"), (("amment",), "amment"),
            (("emment",), "emment"), (("ments", "ment"), "ment"),
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
            if w.endswith("ic"):
                if in_r2(w, 2):
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
            return w, True
        if kind == "log":
            if not in_r2(w, n):
                return w, False
            return w[:-n] + "log", True
        if kind == "u":
            if not in_r2(w, n):
                return w, False
            return w[:-n] + "u", True
        if kind == "ent":
            if not in_r2(w, n):
                return w, False
            return w[:-n] + "ent", True
        if kind == "ement":
            if not in_rv(w, n):
                return w, False
            w = w[:-n]
            if w.endswith("iv") and in_r2(w, 2):
                w = w[:-2]
                if w.endswith("at") and in_r2(w, 2):
                    w = w[:-2]
            elif w.endswith("eus"):
                if in_r2(w, 3):
                    w = w[:-3]
                elif in_r1(w, 3):
                    w = w[:-3] + "eux"
            elif w.endswith("abl") and in_r2(w, 3):
                w = w[:-3]
            elif w.endswith("iqU") and in_r2(w, 3):
                w = w[:-3]
            elif w.endswith("ièr") and in_rv(w, 3):
                w = w[:-3] + "i"
            elif w.endswith("Ièr") and in_rv(w, 3):
                w = w[:-3] + "i"
            return w, True
        if kind == "ite":
            if not in_r2(w, n):
                return w, False
            w = w[:-n]
            if w.endswith("abil"):
                if in_r2(w, 4):
                    w = w[:-4]
                else:
                    w = w[:-4] + "abl"
            elif w.endswith("ic"):
                if in_r2(w, 2):
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
            elif w.endswith("iv") and in_r2(w, 2):
                w = w[:-2]
            return w, True
        if kind == "if":
            if not in_r2(w, n):
                return w, False
            w = w[:-n]
            if w.endswith("at") and in_r2(w, 2):
                w = w[:-2]
                if w.endswith("ic"):
                    if in_r2(w, 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
            return w, True
        if kind == "eaux":
            return w[:-4] + "eau", True
        if kind == "aux":
            if not in_r1(w, 3):
                return w, False
            return w[:-3] + "al", True
        if kind == "euse":
            if in_r2(w, n):
                return w[:-n], True
            if in_r1(w, n):
                return w[:-n] + "eux", True
            return w, False
        if kind == "issement":
            if not in_r1(w, n):
                return w, False
            pre = len(w) - n - 1
            if pre < 0 or _is_v(w[pre]):
                return w, False
            return w[:-n], True
        if kind == "amment":
            if not in_rv(w, 6):
                return w, False
            return w[:-6] + "ant", False  # edit, then fail
        if kind == "emment":
            if not in_rv(w, 6):
                return w, False
            return w[:-6] + "ent", False  # edit, then fail
        # ment / ments: delete if preceded by a vowel in RV; edit then fail
        pre = len(w) - n - 1
        if pre >= 0 and _is_v(w[pre]) and pre >= rv:
            return w[:-n], False
        return w, False

    def i_verb(w):
        for suf in _I_VERB:
            if w.endswith(suf) and in_rv(w, len(suf)):
                pre = len(w) - len(suf) - 1
                if pre >= rv and not _is_v(w[pre]):
                    return w[:-len(suf)], True
                return w, False  # matched longest-in-RV; condition failed
        return w, False

    def verb(w):
        cands = []
        for group, kind in (
            (_VERB_IONS, "ions"), (_VERB_RV, "del"), (_VERB_E, "e"),
        ):
            for suf in group:
                if w.endswith(suf) and in_rv(w, len(suf)):
                    cands.append((len(suf), kind, suf))
        if not cands:
            return w, False
        n, kind, suf = max(cands, key=lambda c: c[0])
        if kind == "ions":
            if not in_r2(w, n):
                return w, False
            return w[:-n], True
        w = w[:-n]
        if kind == "e" and w.endswith("e") and len(w) - 1 >= rv:
            w = w[:-1]
        return w, True

    def residual(w):
        if w.endswith("s"):
            pre = len(w) - 2
            if pre < 0 or w[pre] not in _KEEP_WITH_S:
                w = w[:-1]
        cands = []
        for suf, repl in _RESID:
            if w.endswith(suf) and in_rv(w, len(suf)):
                cands.append((len(suf), suf, repl))
        if not cands:
            return w
        n, suf, repl = max(cands, key=lambda c: c[0])
        if suf == "ion":
            pre = len(w) - 4
            if in_r2(w, 3) and pre >= rv and w[pre] in "st":
                w = w[:-3]
        elif suf == "ë":
            if len(w) - 3 >= rv and w.endswith("guë"):
                w = w[:-1]
        elif repl == "i":
            w = w[:-n] + "i"
        else:  # "e"
            w = w[:-1]
        return w

    new_w, ok = standard(w)
    if not ok:
        w2, ok = i_verb(new_w)
        if not ok:
            w2, ok = verb(new_w)
        new_w = w2
    if ok:
        # try: trailing Y -> i, or trailing ç -> c
        if new_w.endswith("Y"):
            new_w = new_w[:-1] + "i"
        elif new_w.endswith("ç"):
            new_w = new_w[:-1] + "c"
    else:
        new_w = residual(new_w)
    w = new_w

    # un_double
    if w.endswith(_DOUBLES):
        w = w[:-1]
    # un_accent: >=1 trailing non-vowel, then é/è -> e
    j = len(w)
    while j > 0 and not _is_v(w[j - 1]):
        j -= 1
    if j < len(w) and j > 0 and w[j - 1] in "éè":
        w = w[: j - 1] + "e" + w[j:]

    # postlude: every capital I/U/Y lowers (faithful to the bundled code)
    return w.translate(str.maketrans("IUY", "iuy"))
