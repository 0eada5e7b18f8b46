"""Snowball Russian stemmer — pure Python, case-preserving (Cyrillic).

Re-implements the published Snowball Russian algorithm
(snowballstem.org/algorithms/russian/stemmer.html) at the revision the
reference bundles (c/lib/libstemmer_c/src_c/stem_UTF_8_russian.c — no
ё->е normalization, which is a later Snowball addition). Matches the
compiled bundled stemmer on a mixed-case vocabulary sweep with zero
mismatches (tests/test_snowball_ru.py). Lowercase Cyrillic vowels only;
uppercase input passes through untouched, like the Latin stemmers."""

from __future__ import annotations

_V = frozenset("аеиоуыэюя")

_GERUND_AYA = ("вшись", "вши", "в")
_GERUND_DEL = ("ывшись", "ившись", "ывши", "ивши", "ыв", "ив")
_REFLEX = ("сь", "ся")
_ADJ = (
    "ыми", "ими", "его", "ого", "ему", "ому", "ых", "их", "ую", "юю",
    "ею", "ою", "яя", "ая", "ые", "ее", "ие", "ое", "ый", "ей", "ий",
    "ой", "ым", "ем", "им", "ом",
)
_PART_AYA = ("ющ", "вш", "ем", "нн", "щ")
_PART_DEL = ("ывш", "ивш", "ующ")
_VERB_AYA = (
    "ете", "йте", "ешь", "нно", "ют", "ет", "ны", "ть", "ла", "на",
    "ли", "ем", "ло", "но", "й", "л", "н",
)
_VERB_DEL = (
    "уйте", "ейте", "уют", "ует", "ены", "ыть", "ить", "ишь", "ыла",
    "ила", "ена", "ите", "ыли", "или", "ыло", "ило", "ено", "ыт",
    "ят", "ит", "ую", "уй", "ей", "ыл", "ил", "ым", "им", "ен", "ю",
)
_NOUN = (
    "иями", "ями", "ами", "иях", "ией", "иям", "ием", "иях", "ях",
    "ах", "ью", "ию", "ья", "ия", "ев", "ов", "ье", "ие", "еи", "ии",
    "ей", "ий", "ой", "ям", "ам", "ем", "ом", "у", "ы", "ь", "ю",
    "я", "а", "е", "и", "й", "о",
)


def _is_v(c: str) -> bool:
    return c in _V


def stem(word: str) -> str:
    w = word
    # RV = after the first vowel; R2 = standard second region
    rv = len(w)
    for i, c in enumerate(w):
        if _is_v(c):
            rv = i + 1
            break
    r1 = len(w)
    i = rv
    while i < len(w):
        if not _is_v(w[i]):
            r1 = i + 1
            break
        i += 1
    r2 = len(w)
    i = r1
    found_v = False
    while i < len(w):
        if _is_v(w[i]):
            found_v = True
        elif found_v:
            r2 = i + 1
            break
        i += 1

    def fits(wd, n):  # suffix entirely within RV
        return len(wd) - n >= rv

    def match_aya(wd, groups_aya, groups_del):
        """Longest among over both groups; group-aya needs а/я before
        (the а/я stays and must be within the RV limit)."""
        cands = []
        for s in groups_aya:
            if wd.endswith(s) and fits(wd, len(s)):
                cands.append((len(s), "aya", s))
        for s in groups_del:
            if wd.endswith(s) and fits(wd, len(s)):
                cands.append((len(s), "del", s))
        if not cands:
            return wd, False
        n, kind, s = max(cands, key=lambda c: c[0])
        if kind == "del":
            return wd[:-n], True
        pre = len(wd) - n - 1
        if pre >= rv and wd[pre] in "ая":
            return wd[:-n], True
        return wd, False

    # step 1
    w2, ok = match_aya(w, _GERUND_AYA, _GERUND_DEL)
    if ok:
        w = w2
    else:
        for s in _REFLEX:
            if w.endswith(s) and fits(w, len(s)):
                w = w[: -len(s)]
                break
        # adjectival = adjective, then try participle
        hit = False
        for s in sorted(_ADJ, key=len, reverse=True):
            if w.endswith(s) and fits(w, len(s)):
                w = w[: -len(s)]
                hit = True
                break
        if hit:
            w2, _ = match_aya(w, _PART_AYA, _PART_DEL)
            w = w2
        else:
            w2, ok = match_aya(w, _VERB_AYA, _VERB_DEL)
            if ok:
                w = w2
            else:
                for s in sorted(_NOUN, key=len, reverse=True):
                    if w.endswith(s) and fits(w, len(s)):
                        w = w[: -len(s)]
                        break

    # step 2: trailing и
    if w.endswith("и") and fits(w, 1):
        w = w[:-1]

    # step 3: derivational (R2)
    for s in ("ость", "ост"):
        if w.endswith(s) and fits(w, len(s)) and len(w) - len(s) >= r2:
            w = w[: -len(s)]
            break

    # step 4: tidy up
    for s in ("ейше", "ейш"):
        if w.endswith(s) and fits(w, len(s)):
            w = w[: -len(s)]
            if w.endswith("нн") and fits(w, 2):
                w = w[:-1]
            return w
    if w.endswith("нн") and fits(w, 2):
        return w[:-1]
    if w.endswith("ь") and fits(w, 1):
        return w[:-1]
    return w
