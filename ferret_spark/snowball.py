"""Stemmer registry — the StemFilter algorithm-name surface.

Reference parity (stem_filter_new, c/src/analysis.c:1447-1487): names
are lowercased before lookup ('HunGarIaN' is accepted spelling for
'hungarian'); a name libstemmer doesn't know raises (the Ruby binding
surfaces that as ArgumentError, tc_token_stream.rb:489-491). Names the
bundled libstemmer knows but this port doesn't implement yet raise
NotImplementedError — distinct from the invalid-name error."""

from __future__ import annotations

from collections.abc import Callable


def _english():
    from ferret_spark.porter2 import stem

    return stem


def _porter():
    from ferret_spark.porter import stem

    return stem


def _german():
    from ferret_spark.snowball_de import stem

    return stem


def _spanish():
    from ferret_spark.snowball_es import stem

    return stem


def _french():
    from ferret_spark.snowball_fr import stem

    return stem


def _italian():
    from ferret_spark.snowball_it import stem

    return stem


def _portuguese():
    from ferret_spark.snowball_pt import stem

    return stem


def _russian():
    from ferret_spark.snowball_ru import stem

    return stem


def _danish():
    from ferret_spark.snowball_scand import stem_danish

    return stem_danish


def _norwegian():
    from ferret_spark.snowball_scand import stem_norwegian

    return stem_norwegian


def _swedish():
    from ferret_spark.snowball_scand import stem_swedish

    return stem_swedish


def _dutch():
    from ferret_spark.snowball_nl import stem

    return stem


def _romanian():
    from ferret_spark.snowball_ro import stem

    return stem


def _finnish():
    from ferret_spark.snowball_fi import stem

    return stem


def _hungarian():
    from ferret_spark.snowball_hu import stem

    return stem


def _turkish():
    from ferret_spark.snowball_tr import stem

    return stem


_IMPLEMENTED: dict[str, Callable[[], Callable[[str], str]]] = {
    "english": _english,
    "porter": _porter,  # original Porter (1980), kept as its own algorithm
    "german": _german,
    "spanish": _spanish,
    "french": _french,
    "italian": _italian,
    "portuguese": _portuguese,
    "russian": _russian,
    "danish": _danish,
    "norwegian": _norwegian,
    "swedish": _swedish,
    "dutch": _dutch,
    "romanian": _romanian,
    "finnish": _finnish,
    "hungarian": _hungarian,
    "turkish": _turkish,
}

def get_stemmer(name: str | bool = "english") -> Callable[[str], str]:
    """All 16 sb_stemmer_list() algorithms of the bundled libstemmer
    resolve (plus the classic 'porter'); anything else is unknown."""
    if name is True:
        name = "english"
    n = str(name).lower()
    loader = _IMPLEMENTED.get(n)
    if loader is not None:
        return loader()
    raise ValueError(f"unknown stemming algorithm: {name!r}")
