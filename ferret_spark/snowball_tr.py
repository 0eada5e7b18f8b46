"""Snowball Turkish stemmer — pure Python, no case folding.

Re-implements the published Snowball Turkish algorithm (Evren Kapusuz
Çilden, snowballstem.org/algorithms/turkish/stemmer.html) at the revision
the reference bundles (c/lib/libstemmer_c/src_c/stem_UTF_8_turkish.c).
Matches the compiled bundled stemmer with zero mismatches on the sweep in
tests/test_snowball_tr.py.

Structure notes (Snowball semantics this transcription preserves):
- backward-mode cursor machine: suffix "mark" routines move a cursor
  leftward from the word end; `[`/`]` bracket the slice to delete.
- or-alternative backtracking restores the CURSOR ONLY, measured as a
  distance from the (current) word end — deletions performed by a failed
  alternative are permanent, exactly as in Snowball's slice_del.
- a word needs >= 2 vowels to be stemmed at all; stemming stops after the
  nominal-verb pass when the -lAr branch fired (continue_stemming flag).
- postlude: stems equal to the reserved words are returned as-is; stems
  ending d/g get the harmony vowel appended; final b/c/d/ğ devoice.
"""

from __future__ import annotations

_VOWEL = frozenset("aeıioöuü")
_U_VOW = frozenset("ıiuü")
# vowel-harmony classes: last stem vowel -> admissible earlier vowels
_HARMONY = {
    "a": frozenset("aıou"),
    "e": frozenset("eiöü"),
    "ı": frozenset("aı"),
    "i": frozenset("ei"),
    "o": frozenset("ou"),
    "ö": frozenset("öü"),
    "u": frozenset("ou"),
    "ü": frozenset("öü"),
}

_A_POSS = ("m", "n", "miz", "niz", "muz", "nuz", "mız", "nız", "müz", "nüz")
_A_yDU = (
    "di", "ti", "dik", "tik", "duk", "tuk", "dık", "tık", "dük", "tük",
    "dim", "tim", "dum", "tum", "dım", "tım", "düm", "tüm",
    "din", "tin", "dun", "tun", "dın", "tın", "dün", "tün",
    "du", "tu", "dı", "tı", "dü", "tü",
)


class _S:
    __slots__ = ("w", "c", "ket", "cont")

    def __init__(self, w: str):
        self.w = w
        self.c = len(w)
        self.ket = len(w)
        self.cont = True


def _m(z: _S) -> int:
    """Save point: distance from the word end (slice_del-invariant)."""
    return len(z.w) - z.c


def _r(z: _S, m: int) -> None:
    z.c = len(z.w) - m


def _open(z: _S) -> None:  # `[`
    z.ket = z.c


def _del(z: _S) -> None:  # `]` + delete
    z.w = z.w[: z.c] + z.w[z.ket :]
    z.ket = z.c


def _ends(z: _S, s: str) -> bool:
    if z.w[: z.c].endswith(s):
        z.c -= len(s)
        return True
    return False


def _among(z: _S, suffixes) -> bool:
    """Longest-suffix match (Snowball among), consuming on success."""
    head = z.w[: z.c]
    best = ""
    for suf in suffixes:
        if len(suf) > len(best) and head.endswith(suf):
            best = suf
    if not best:
        return False
    z.c -= len(best)
    return True


def _harmony_ok(z: _S) -> bool:
    """check_vowel_harmony: the last vowel left of the cursor must be
    preceded (anywhere) by a vowel of its harmony class."""
    w, c = z.w, z.c
    j = c - 1
    while j >= 0 and w[j] not in _VOWEL:
        j -= 1
    if j < 0:
        return False
    cls = _HARMONY[w[j]]
    k = j - 1
    while k >= 0 and w[k] not in cls:
        k -= 1
    return k >= 0


def _opt_cons(z: _S, ch: str) -> bool:
    """mark_suffix_with_optional_{n,s,y}_consonant: consume ch when it is
    vowel-preceded; otherwise require a vowel two back without consuming.
    A bare ch that is NOT vowel-preceded fails the whole mark."""
    w, c = z.w, z.c
    if c >= 1 and w[c - 1] == ch:
        if c >= 2 and w[c - 2] in _VOWEL:
            z.c -= 1
            return True
        return False
    return c >= 2 and w[c - 2] in _VOWEL


def _opt_U(z: _S) -> bool:
    """mark_suffix_with_optional_U_vowel (dual of _opt_cons: the optional
    part is a high vowel that must be consonant-preceded)."""
    w, c = z.w, z.c
    if c >= 1 and w[c - 1] in _U_VOW:
        if c >= 2 and w[c - 2] not in _VOWEL:
            z.c -= 1
            return True
        return False
    return c >= 2 and w[c - 2] not in _VOWEL


# --- mark routines (cursor movers; callers restore on failure) -------------

def _mk_possessives(z):
    return _among(z, _A_POSS) and _opt_U(z)


def _mk_sU(z):
    if not _harmony_ok(z):
        return False
    if z.c >= 1 and z.w[z.c - 1] in _U_VOW:
        z.c -= 1
        return _opt_cons(z, "s")
    return False


def _mk_lArI(z):
    return _among(z, ("leri", "ları"))


def _mk_yU(z):
    if not _harmony_ok(z):
        return False
    if z.c >= 1 and z.w[z.c - 1] in _U_VOW:
        z.c -= 1
        return _opt_cons(z, "y")
    return False


def _mk_nU(z):
    return _harmony_ok(z) and _among(z, ("ni", "nu", "nı", "nü"))


def _mk_nUn(z):
    return (
        _harmony_ok(z)
        and _among(z, ("in", "un", "ın", "ün"))
        and _opt_cons(z, "n")
    )


def _mk_yA(z):
    return _harmony_ok(z) and _among(z, ("a", "e")) and _opt_cons(z, "y")


def _mk_nA(z):
    return _harmony_ok(z) and _among(z, ("na", "ne"))


def _mk_DA(z):
    return _harmony_ok(z) and _among(z, ("da", "ta", "de", "te"))


def _mk_ndA(z):
    return _harmony_ok(z) and _among(z, ("nda", "nde"))


def _mk_DAn(z):
    return _harmony_ok(z) and _among(z, ("dan", "tan", "den", "ten"))


def _mk_ndAn(z):
    return _harmony_ok(z) and _among(z, ("ndan", "nden"))


def _mk_ylA(z):
    return _harmony_ok(z) and _among(z, ("la", "le")) and _opt_cons(z, "y")


def _mk_ki(z):
    return _ends(z, "ki")


def _mk_ncA(z):
    return _harmony_ok(z) and _among(z, ("ca", "ce")) and _opt_cons(z, "n")


def _mk_yUm(z):
    return (
        _harmony_ok(z)
        and _among(z, ("im", "um", "ım", "üm"))
        and _opt_cons(z, "y")
    )


def _mk_sUn(z):
    return _harmony_ok(z) and _among(z, ("sin", "sun", "sın", "sün"))


def _mk_yUz(z):
    return (
        _harmony_ok(z)
        and _among(z, ("iz", "uz", "ız", "üz"))
        and _opt_cons(z, "y")
    )


def _mk_sUnUz(z):
    return _among(z, ("siniz", "sunuz", "sınız", "sünüz"))


def _mk_lAr(z):
    return _harmony_ok(z) and _among(z, ("lar", "ler"))


def _mk_nUz(z):
    return _harmony_ok(z) and _among(z, ("niz", "nuz", "nız", "nüz"))


def _mk_DUr(z):
    return _harmony_ok(z) and _among(
        z, ("dir", "tir", "dur", "tur", "dır", "tır", "dür", "tür")
    )


def _mk_cAsInA(z):
    return _among(z, ("casına", "cesine"))


def _mk_yDU(z):
    return _harmony_ok(z) and _among(z, _A_yDU) and _opt_cons(z, "y")


def _mk_ysA(z):
    return (
        _among(z, ("sa", "se", "sak", "sek", "sam", "sem", "san", "sen"))
        and _opt_cons(z, "y")
    )


def _mk_ymUs(z):
    return (
        _harmony_ok(z)
        and _among(z, ("miş", "muş", "mış", "müş"))
        and _opt_cons(z, "y")
    )


def _mk_yken(z):
    return _ends(z, "ken") and _opt_cons(z, "y")


# --- composite steps -------------------------------------------------------

def _first_of(z, m, marks) -> bool:
    """or-chain: try each mark from save point m, restoring between (and
    after a final failure)."""
    for f in marks:
        if f(z):
            return True
        _r(z, m)
    return False


def _nominal_verb(z: _S) -> bool:
    _open(z)
    z.cont = True
    m1 = _m(z)
    while True:  # single-pass "or" ladder; break = go to final delete
        # (ymUs | yDU | ysA | yken)
        if _first_of(z, m1, (_mk_ymUs, _mk_yDU, _mk_ysA, _mk_yken)):
            break
        # cAsInA (sUnUz|lAr|yUm|sUn|yUz|ε) ymUs
        if _mk_cAsInA(z):
            m3 = _m(z)
            _first_of(z, m3, (_mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn, _mk_yUz))
            if _mk_ymUs(z):
                break
        _r(z, m1)
        # lAr ] delete try([ (DUr|yDU|ysA|ymUs) ); unset continue flag
        if _mk_lAr(z):
            _del(z)
            mk = _m(z)
            _open(z)
            if not _first_of(z, mk, (_mk_DUr, _mk_yDU, _mk_ysA, _mk_ymUs)):
                _r(z, mk)
            z.cont = False
            break
        _r(z, m1)
        # nUz (yDU|ysA)
        if _mk_nUz(z):
            m5 = _m(z)
            if _first_of(z, m5, (_mk_yDU, _mk_ysA)):
                break
        _r(z, m1)
        # (sUnUz|yUz|sUn|yUm) ] delete try([ymUs)
        if _first_of(z, m1, (_mk_sUnUz, _mk_yUz, _mk_sUn, _mk_yUm)):
            _del(z)
            mk = _m(z)
            _open(z)
            if not _mk_ymUs(z):
                _r(z, mk)
            break
        _r(z, m1)
        # DUr ] delete try([ (sUnUz|lAr|yUm|sUn|yUz|ε) ymUs )
        if not _mk_DUr(z):
            return False
        _del(z)
        mk = _m(z)
        _open(z)
        m7 = _m(z)
        _first_of(z, m7, (_mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn, _mk_yUz))
        if not _mk_ymUs(z):
            _r(z, mk)
        break
    _del(z)
    return True


def _chain_ki(z: _S) -> bool:
    _open(z)
    if not _mk_ki(z):
        return False
    m1 = _m(z)
    # alt A: DA ] delete try( (lAr ] del try(ki)) | (poss ] del try([lAr] del ki)) )
    if _mk_DA(z):
        _del(z)
        mk = _m(z)
        _open(z)
        if _mk_lAr(z):
            _del(z)
            mk2 = _m(z)
            if not _chain_ki(z):
                _r(z, mk2)
        else:
            _r(z, mk)
            if _mk_possessives(z):
                _del(z)
                mk2 = _m(z)
                _open(z)
                if _mk_lAr(z):
                    _del(z)
                    if not _chain_ki(z):
                        _r(z, mk2)
                else:
                    _r(z, mk2)
            else:
                _r(z, mk)
        return True
    _r(z, m1)
    # alt B: nUn ] delete try( (lArI ] del) | ([ (poss|sU) ] del try([lAr] del ki)) | ki )
    if _mk_nUn(z):
        _del(z)
        mk = _m(z)
        _open(z)
        if _mk_lArI(z):
            _del(z)
        else:
            _r(z, mk)
            _open(z)
            if _first_of(z, mk, (_mk_possessives, _mk_sU)):
                _del(z)
                mk2 = _m(z)
                _open(z)
                if _mk_lAr(z):
                    _del(z)
                    if not _chain_ki(z):
                        _r(z, mk2)
                else:
                    _r(z, mk2)
            else:
                if not _chain_ki(z):
                    _r(z, mk)
        return True
    _r(z, m1)
    # alt C: ndA ( (lArI ] del) | (sU ] del try([lAr] del ki)) | ki )
    if not _mk_ndA(z):
        return False
    m5 = _m(z)
    if _mk_lArI(z):
        _del(z)
        return True
    _r(z, m5)
    if _mk_sU(z):
        _del(z)
        mk = _m(z)
        _open(z)
        if _mk_lAr(z):
            _del(z)
            if not _chain_ki(z):
                _r(z, mk)
        else:
            _r(z, mk)
        return True
    _r(z, m5)
    return _chain_ki(z)


def _noun_suffixes(z: _S) -> bool:
    m1 = _m(z)
    # B1: [lAr] del try(ki)
    _open(z)
    if _mk_lAr(z):
        _del(z)
        mk = _m(z)
        if not _chain_ki(z):
            _r(z, mk)
        return True
    _r(z, m1)
    # B2: [ncA] del try( ([lArI] del) | ([(poss|sU)] del try([lAr] del ki)) | ([lAr] del ki) )
    _open(z)
    if _mk_ncA(z):
        _del(z)
        mk = _m(z)
        _open(z)
        if _mk_lArI(z):
            _del(z)
        else:
            _r(z, mk)
            _open(z)
            if _first_of(z, mk, (_mk_possessives, _mk_sU)):
                _del(z)
                mk2 = _m(z)
                _open(z)
                if _mk_lAr(z):
                    _del(z)
                    if not _chain_ki(z):
                        _r(z, mk2)
                else:
                    _r(z, mk2)
            else:
                _open(z)
                if _mk_lAr(z):
                    _del(z)
                    if not _chain_ki(z):
                        _r(z, mk)
                else:
                    _r(z, mk)
        return True
    _r(z, m1)
    # B3: [ (ndA|nA) ( (lArI ] del) | (sU ] del try([lAr] del ki)) | ki ) ]
    _open(z)
    if _first_of(z, m1, (_mk_ndA, _mk_nA)):
        m5 = _m(z)
        if _mk_lArI(z):
            _del(z)
            return True
        _r(z, m5)
        if _mk_sU(z):
            _del(z)
            mk = _m(z)
            _open(z)
            if _mk_lAr(z):
                _del(z)
                if not _chain_ki(z):
                    _r(z, mk)
            else:
                _r(z, mk)
            return True
        _r(z, m5)
        if _chain_ki(z):
            return True
    _r(z, m1)
    # B4: [ (ndAn|nU) ( (sU ] del try([lAr] del ki)) | lArI ) ]
    #     (the lArI alternative matches without deleting — bundled-version
    #     behavior, kept verbatim)
    _open(z)
    if _first_of(z, m1, (_mk_ndAn, _mk_nU)):
        m7 = _m(z)
        if _mk_sU(z):
            _del(z)
            mk = _m(z)
            _open(z)
            if _mk_lAr(z):
                _del(z)
                if not _chain_ki(z):
                    _r(z, mk)
            else:
                _r(z, mk)
            return True
        _r(z, m7)
        if _mk_lArI(z):
            return True
    _r(z, m1)
    # B5: [DAn] del try([ (poss ] del try([lAr] del ki)) | (lAr ] del try(ki)) | ki )
    _open(z)
    if _mk_DAn(z):
        _del(z)
        mk = _m(z)
        _open(z)
        if _mk_possessives(z):
            _del(z)
            mk2 = _m(z)
            _open(z)
            if _mk_lAr(z):
                _del(z)
                if not _chain_ki(z):
                    _r(z, mk2)
            else:
                _r(z, mk2)
        else:
            _r(z, mk)
            if _mk_lAr(z):
                _del(z)
                mk2 = _m(z)
                if not _chain_ki(z):
                    _r(z, mk2)
            else:
                _r(z, mk)
                if not _chain_ki(z):
                    _r(z, mk)
        return True
    _r(z, m1)
    # B6: [ (nUn|ylA) ] del try( ([lAr] del ki) | ([(poss|sU)] del try([lAr] del ki)) | ki )
    _open(z)
    if _first_of(z, m1, (_mk_nUn, _mk_ylA)):
        _del(z)
        mk = _m(z)
        done = False
        _open(z)
        if _mk_lAr(z):
            _del(z)
            done = _chain_ki(z)
        if not done:
            _r(z, mk)
            _open(z)
            if _first_of(z, mk, (_mk_possessives, _mk_sU)):
                _del(z)
                mk2 = _m(z)
                _open(z)
                if _mk_lAr(z):
                    _del(z)
                    if not _chain_ki(z):
                        _r(z, mk2)
                else:
                    _r(z, mk2)
            else:
                if not _chain_ki(z):
                    _r(z, mk)
        return True
    _r(z, m1)
    # B7: [lArI] del
    _open(z)
    if _mk_lArI(z):
        _del(z)
        return True
    _r(z, m1)
    # B8: ki-chain alone
    if _chain_ki(z):
        return True
    _r(z, m1)
    # B9: [ (DA|yU|yA) ] del try([ ( (poss ] del try([lAr)) | lAr ) ] del [ki )
    _open(z)
    if _first_of(z, m1, (_mk_DA, _mk_yU, _mk_yA)):
        _del(z)
        mk = _m(z)
        _open(z)
        matched = False
        if _mk_possessives(z):
            _del(z)
            mk2 = _m(z)
            _open(z)
            if not _mk_lAr(z):
                _r(z, mk2)
            matched = True
        else:
            _r(z, mk)
            matched = _mk_lAr(z)
        if matched:
            _del(z)
            _open(z)
            if not _chain_ki(z):
                _r(z, mk)
        else:
            _r(z, mk)
        return True
    _r(z, m1)
    # B10: [ (poss|sU) ] del try([lAr] del ki)
    _open(z)
    if _first_of(z, m1, (_mk_possessives, _mk_sU)):
        _del(z)
        mk = _m(z)
        _open(z)
        if _mk_lAr(z):
            _del(z)
            if not _chain_ki(z):
                _r(z, mk)
        else:
            _r(z, mk)
        return True
    return False


def _append_U(z: _S) -> None:
    w = z.w
    if not (w.endswith("d") or w.endswith("g")):
        return
    j = len(w) - 1
    while j >= 0 and w[j] not in _VOWEL:
        j -= 1
    if j < 0:
        return
    v = w[j]
    if v in "aı":
        z.w = w + "ı"
    elif v in "ei":
        z.w = w + "i"
    elif v in "ou":
        z.w = w + "u"
    else:  # ö ü
        z.w = w + "ü"


_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def stem(word: str) -> str:
    # more_than_one_syllable_word: at least two vowels
    if sum(1 for ch in word if ch in _VOWEL) < 2:
        return word
    z = _S(word)
    _nominal_verb(z)  # do: result ignored, cursor irrelevant afterwards
    if not z.cont:
        return z.w
    z.c = len(z.w)
    z.ket = len(z.w)
    _noun_suffixes(z)  # do
    # postlude
    if z.w in ("ad", "soyad"):  # is_reserved_word
        return z.w
    _append_U(z)
    w = z.w
    if w and w[-1] in _DEVOICE:
        w = w[:-1] + _DEVOICE[w[-1]]
    return w
