"""Snowball Spanish stemmer — pure Python, case-preserving.

Re-implements the published Snowball Spanish algorithm
(snowballstem.org/algorithms/spanish/stemmer.html) at the revision the
reference bundles (c/lib/libstemmer_c/src_c/stem_UTF_8_spanish.c).
Matches the compiled bundled stemmer on a mixed Spanish/English
mixed-case vocabulary with zero mismatches (tests/test_snowball_es.py).

Same case discipline as the other Snowball ports: matching is
case-sensitive over lowercase patterns, vowels are lowercase
``aeiouáéíóúü``; the postlude removes acute accents only.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouáéíóúü")

_PRONOUNS = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "la", "le", "lo", "me", "se",
)
# (marker, replacement or None=delete-pronoun-only); longest-first
_P_MARKERS = (
    ("iéndo", "iendo"), ("iendo", None), ("yendo", None), ("ándo", "ando"),
    ("ando", None), ("ár", "ar"), ("ér", "er"), ("ír", "ir"),
    ("ar", None), ("er", None), ("ir", None),
)

_STD_DELETE_R2 = (
    "amientos", "imientos", "amiento", "imiento", "ismos", "ables",
    "ibles", "istas", "anzas", "icas", "icos", "osas", "osos", "able",
    "ible", "ismo", "ista", "anza", "ica", "ico", "osa", "oso",
)
_STD_IC = ("aciones", "adoras", "adores", "ancias", "ación", "adora",
           "ancia", "antes", "ador", "ante")
_Y_SUFFIXES = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
               "yes", "ya", "ye", "yo", "yó")
_VERB_GU = ("emos", "éis", "en", "es")
_VERB_DELETE = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aremos", "eríais", "eremos", "iríais", "iremos", "ierais", "ieseis",
    "asteis", "isteis", "ábamos", "áramos", "ásemos", "arían", "arías",
    "aréis", "erían", "erías", "eréis", "irían", "irías", "iréis",
    "ieran", "iesen", "ieron", "iendo", "ieras", "ieses", "abais",
    "arais", "aseis", "íamos", "arán", "arás", "aría", "erán", "erás",
    "ería", "irán", "irás", "iría", "iera", "iese", "aste", "iste",
    "aban", "aran", "asen", "aron", "ados", "idos", "amos", "imos",
    "ías", "ará", "aré", "erá", "eré", "irá", "iré", "aba", "ada",
    "ida", "ara", "ase", "ían", "ado", "ido", "ando", "íais", "ía",
    "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as", "abas",
    "adas", "idas", "aras", "ases", "ís", "áis",
)
_RESIDUAL_A = ("os", "a", "o", "á", "í", "ó")


def _is_v(c: str) -> bool:
    return c in _VOWELS


def _r_start(w: str, begin: int) -> int:
    for i in range(begin, len(w) - 1):
        if _is_v(w[i]) and not _is_v(w[i + 1]):
            return i + 2
    return len(w)


def _rv_start(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if not _is_v(w[1]):  # second letter consonant: after the next vowel
        for i in range(2, n):
            if _is_v(w[i]):
                return i + 1
        return n
    if _is_v(w[0]):  # two vowels: after the next consonant
        for i in range(2, n):
            if not _is_v(w[i]):
                return i + 1
        return n
    return 3  # consonant-vowel: after the third letter


def stem(word: str) -> str:
    w = word
    rv = _rv_start(w)
    r1 = _r_start(w, 0)
    r2 = _r_start(w, r1)

    def in_rv(suffix_len: int) -> bool:
        return len(w) - suffix_len >= rv

    def in_r1(suffix_len: int) -> bool:
        return len(w) - suffix_len >= r1

    def in_r2(suffix_len: int) -> bool:
        return len(w) - suffix_len >= r2

    # ---- step 0: attached pronoun --------------------------------------
    for pro in _PRONOUNS:
        if not w.endswith(pro):
            continue
        base = w[: -len(pro)]
        for mk, repl in _P_MARKERS:
            if not base.endswith(mk):
                continue
            if len(base) - len(mk) < rv:
                break  # marker not in RV
            if mk == "yendo":
                if base[: -len(mk)].endswith("u"):
                    w = base
            elif repl is not None:
                w = base[: -len(mk)] + repl
            else:
                w = base
            break
        break

    # ---- step 1 / 2a / 2b (first that fires wins) ----------------------
    # step 1 is ONE longest-match among; if the matched suffix's region
    # condition fails, the whole step fails (no shorter-suffix retry) and
    # the verb steps run instead
    done = False
    cands = []
    for suf in _STD_DELETE_R2:
        if w.endswith(suf):
            cands.append((len(suf), "del", suf))
    for suf in _STD_IC:
        if w.endswith(suf):
            cands.append((len(suf), "ic", suf))
    for suf in ("logías", "logía"):
        if w.endswith(suf):
            cands.append((len(suf), "log", suf))
    for suf in ("uciones", "ución"):
        if w.endswith(suf):
            cands.append((len(suf), "u", suf))
    for suf in ("encias", "encia"):
        if w.endswith(suf):
            cands.append((len(suf), "ente", suf))
    if w.endswith("amente"):
        cands.append((6, "amente", "amente"))
    elif w.endswith("mente"):
        cands.append((5, "mente", "mente"))
    for suf in ("idades", "idad"):
        if w.endswith(suf):
            cands.append((len(suf), "idad", suf))
    for suf in ("ivas", "ivos", "iva", "ivo"):
        if w.endswith(suf):
            cands.append((len(suf), "iv", suf))
    if cands:
        n, kind, suf = max(cands, key=lambda c: c[0])
        if kind == "amente":
            if in_r1(6):
                w = w[:-6]
                done = True
                if w.endswith("iv") and in_r2(2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and in_r2(2):
                            w = w[:-2]
                            break
        elif in_r2(n):
            done = True
            if kind == "del":
                w = w[:-n]
            elif kind == "ic":
                w = w[:-n]
                if w.endswith("ic") and in_r2(2):
                    w = w[:-2]
            elif kind == "log":
                w = w[:-n] + "log"
            elif kind == "u":
                w = w[:-n] + "u"
            elif kind == "ente":
                w = w[:-n] + "ente"
            elif kind == "mente":
                w = w[:-5]
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and in_r2(4):
                        w = w[:-4]
                        break
            elif kind == "idad":
                w = w[:-n]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(pre)):
                        w = w[: -len(pre)]
                        break
            elif kind == "iv":
                w = w[:-n]
                if w.endswith("at") and in_r2(2):
                    w = w[:-2]

    if not done:
        # step 2a: y-verb suffixes in RV, preceded by u
        for suf in _Y_SUFFIXES:
            if w.endswith(suf) and in_rv(len(suf)):
                if w[: -len(suf)].endswith("u"):
                    w = w[: -len(suf)]
                    done = True
                break
    if not done:
        # step 2b: other verb suffixes — the RV limit bounds the match
        # itself, so the LONGEST suffix that fits inside RV wins
        cands = []
        for suf in _VERB_GU:
            if w.endswith(suf) and in_rv(len(suf)):
                cands.append((len(suf), "gu", suf))
        for suf in _VERB_DELETE:
            if w.endswith(suf) and in_rv(len(suf)):
                cands.append((len(suf), "del", suf))
        if cands:
            n, kind, suf = max(cands, key=lambda c: c[0])
            if kind == "gu":
                w = w[:-n]
                if w.endswith("gu"):  # u need not be in RV
                    w = w[:-1]
            else:
                w = w[:-n]

    # ---- step 3: residual suffix ---------------------------------------
    for suf in _RESIDUAL_A:
        if w.endswith(suf):
            if in_rv(len(suf)):
                w = w[: -len(suf)]
            break
    else:
        for suf in ("e", "é"):
            if w.endswith(suf):
                if in_rv(1):
                    w = w[:-1]
                    if w.endswith("gu") and in_rv(1):
                        w = w[:-1]
                break

    # ---- postlude: strip acute accents ---------------------------------
    return w.translate(str.maketrans("áéíóú", "aeiou"))
