"""Snowball German stemmer goldens (bundled-libstemmer behavior).

Produced by the reference's bundled libstemmer compiled as-is and
called via sb_stemmer_stem without pre-lowercasing; the full 31.6k-word
sweep (German suffix grid + natural words + mixed case + the English
vocabulary as arbitrary input) had zero mismatches.
"""

import pytest

from ferret_spark.analysis import Analyzer
from ferret_spark.snowball import get_stemmer
from ferret_spark.snowball_de import stem


GOLDENS = [
    ("AUFEINANDER", "AuFEINANDER"),
    ("AUFEINANDIGKEIT", "AuFEINANDIGKEIT"),
    ("AUFEINANDLICHKEIT", "AuFEINANDLICHKEIT"),
    ("AUFEINANDTE", "AuFEINANDTE"),
    ("Arbeiten", "Arbeit"),
    ("Ausschließlich", "Ausschliess"),
    ("BEISPIELERND", "BEISPIELERND"),
    ("BEISPIELIGUNG", "BEISPIELIGuNG"),
    ("BEISPIELISCH", "BEISPIELISCH"),
    ("BERGKEITEN", "BERGKEITEN"),
    ("Beispiellichkeit", "Beispiel"),
    ("Bergen", "Berg"),
    ("BÄLLTEN", "BÄLLTEN"),
    ("Bällik", "Ballik"),
    ("DAMPFSCHIFFEND", "DAMPFSCHIFFEND"),
    ("DENKERHEIT", "DENKERHEIT"),
    ("DENKIGKEITEN", "DENKIGKEITEN"),
    ("Dampfschiffungen", "Dampfschiff"),
    ("Denken", "Denk"),
    ("Denkest", "Denk"),
    ("ENTWICKLHEITEN", "ENTWICKLHEITEN"),
    ("ENTWICKLIGUNG", "ENTWICKLIGuNG"),
    ("ERLEBNISLICHER", "ERLEBNISLICHER"),
    ("Entwicklnisses", "Entwicklniss"),
    ("Entwicklsten", "Entwickl"),
    ("FAHRIGKEIT", "FAHRIGKEIT"),
    ("FAHRNISSE", "FAHRNISSE"),
    ("FEINDERN", "FEINDERN"),
    ("FEINDTEN", "FEINDTEN"),
    ("FEINDUNG", "FEINDuNG"),
    ("FLIEGERN", "FLIEGERN"),
    ("FLIEGERND", "FLIEGERND"),
    ("FLIEGISCHES", "FLIEGISCHES"),
    ("FRAUER", "FRAuER"),
    ("FRAULICHER", "FRAuLICHER"),
    ("Feinderheit", "Feind"),
    ("Feindnisses", "Feindniss"),
    ("Feindten", "Feindt"),
    ("Fliegern", "Flieg"),
    ("Fliegigend", "Fliegig"),
    ("Fliegisches", "Fliegisch"),
    ("Frauheiten", "Frauheit"),
    ("Fraus", "Fraus"),
    ("Freundest", "Freund"),
    ("Freundheit", "Freundheit"),
    ("Freundt", "Freundt"),
    ("Freundung", "Freundung"),
    ("Fühllichkeit", "Fuhllich"),
    ("Füßet", "Fusset"),
    ("GLÄUBIGEND", "GLÄuBIGEND"),
    ("GLÄUBIGIG", "GLÄuBIGIG"),
    ("GLÄUBIGIGKEIT", "GLÄuBIGIGKEIT"),
    ("GLÄUBIGIK", "GLÄuBIGIK"),
    ("GROSSEN", "GROSSEN"),
    ("Gläubigem", "Glaubig"),
    ("Grünern", "Grun"),
    ("Grünig", "Grunig"),
    ("Grünte", "Grunt"),
    ("Grüntet", "Gruntet"),
    ("HERRLICHSTEN", "HERRLICHSTEN"),
    ("HUNDIGKEITEN", "HuNDIGKEITEN"),
    ("HUNDNISSE", "HuNDNISSE"),
    ("Hausst", "Hausst"),
    ("Herrlichem", "Herrlich"),
    ("Herrlichsten", "Herrlich"),
    ("Hundung", "Hundung"),
    ("HÖRERND", "HÖRERND"),
    ("HÖRIGKEIT", "HÖRIGKEIT"),
    ("HÖRTET", "HÖRTET"),
    ("Hörlich", "Horlich"),
    ("Hörnisses", "Horniss"),
    ("JAHRERND", "JAHRERND"),
    ("JAHRNISSE", "JAHRNISSE"),
    ("JAHRST", "JAHRST"),
    ("Jahrem", "Jahr"),
    ("LAUFERND", "LAuFERND"),
    ("LAUFTET", "LAuFTET"),
    ("LEHRHEIT", "LEHRHEIT"),
    ("LEHRNISSES", "LEHRNISSES"),
    ("Landste", "Land"),
    ("Laufen", "Lauf"),
    ("Laufigkeit", "Laufig"),
    ("Laufisches", "Laufisch"),
    ("Laufungen", "Laufung"),
    ("Lehrs", "Lehr"),
    ("MANNE", "MANNE"),
    ("MANNIG", "MANNIG"),
    ("Mannest", "Mann"),
    ("Mannheiten", "Mannheit"),
    ("Möglichig", "Moglich"),
    ("Müds", "Mud"),
    ("NISSHEIT", "NISSHEIT"),
    ("Nissigkeiten", "Nissig"),
    ("SCHWIMMKEITEN", "SCHWIMMKEITEN"),
    ("SCHWIMMS", "SCHWIMMS"),
    ("Schnellst", "Schnell"),
    ("Schwimmig", "Schwimmig"),
    ("Schöner", "Schon"),
    ("Schönigkeiten", "Schonig"),
    ("SÄCHKEIT", "SÄCHKEIT"),
    ("Sächisch", "Sachisch"),
    ("Unmöglich", "unmoglich"),
    ("VERFOLGUNGEN", "VERFOLGuNGEN"),
    ("Verfolgern", "Verfolg"),
    ("Verfolgigkeit", "Verfolg"),
    ("WALDIGKEITEN", "WALDIGKEITEN"),
    ("Waldend", "Waldend"),
    ("Weiß", "Weiss"),
    ("Weißt", "Weisst"),
    ("Wirkheit", "Wirkheit"),
    ("Zeiterheit", "Zeit"),
    ("arbeitlichkeit", "arbeit"),
    ("aufeinandet", "aufeinandet"),
    ("aufeinandnisse", "aufeinandniss"),
    ("aufeinandung", "aufeinand"),
    ("ausschließlich", "ausschliess"),
    ("beispielerheit", "beispiel"),
    ("beispieligkeit", "beispiel"),
    ("beispielkeiten", "beispiel"),
    ("beispielsten", "beispiel"),
    ("beispielten", "beispielt"),
    ("bergend", "bergend"),
    ("bergtet", "bergtet"),
    ("bällenheit", "ball"),
    ("bäller", "ball"),
    ("bällheit", "ballheit"),
    ("bällik", "ballik"),
    ("bällisch", "ballisch"),
    ("bällste", "ball"),
    ("bällsten", "ball"),
    ("bällung", "ballung"),
    ("dampfschiff", "dampfschiff"),
    ("dampfschiffem", "dampfschiff"),
    ("dampfschiffst", "dampfschiff"),
    ("dampfschifft", "dampfschifft"),
    ("dampfschiffte", "dampfschifft"),
    ("denken", "denk"),
    ("denker", "denk"),
    ("denkerheit", "denk"),
    ("denksten", "denk"),
    ("dünnheiten", "dunnheit"),
    ("dünnigkeit", "dunnig"),
    ("dünnigung", "dunnig"),
    ("dünnkeit", "dunnkeit"),
    ("dünnkeiten", "dunnkeit"),
    ("dünnst", "dunn"),
    ("einzigartig", "einzigart"),
    ("entwicklkeit", "entwickl"),
    ("erlebnise", "erlebnis"),
    ("erlebnisem", "erlebnis"),
    ("erlebnislichkeit", "erlebnis"),
    ("erlebnisnisse", "erlebnisniss"),
    ("fahrkeiten", "fahrkeit"),
    ("fahrungen", "fahrung"),
    ("feinde", "feind"),
    ("feindes", "feind"),
    ("feindheit", "feindheit"),
    ("feindigkeit", "feindig"),
    ("feindlicher", "feindlich"),
    ("feindnisse", "feindniss"),
    ("feindungen", "feindung"),
    ("fliegisches", "fliegisch"),
    ("fliegte", "fliegt"),
    ("flusskeit", "flusskeit"),
    ("flussst", "flussst"),
    ("frauem", "frau"),
    ("frauern", "frau"),
    ("frauheit", "frauheit"),
    ("freundend", "freundend"),
    ("freundigkeit", "freundig"),
    ("freundigkeiten", "freundig"),
    ("freundsten", "freund"),
    ("fühlem", "fuhl"),
    ("fühlend", "fuhlend"),
    ("fühligkeiten", "fuhlig"),
    ("fühlisch", "fuhlisch"),
    ("fühlkeit", "fuhlkeit"),
    ("fühls", "fuhl"),
    ("fühlste", "fuhl"),
    ("füße", "fuss"),
    ("füßheit", "fussheit"),
    ("füßheiten", "fussheit"),
    ("füßlichkeit", "fusslich"),
    ("gehe", "geh"),
    ("geheimnisen", "geheimnis"),
    ("geheimniser", "geheimnis"),
    ("geheimnises", "geheimnis"),
    ("geheimnisig", "geheimnis"),
    ("geheimnisigung", "geheimnis"),
    ("geheimnislicher", "geheimnis"),
    ("gehnisse", "gehniss"),
    ("gehung", "gehung"),
    ("gläubigern", "glaubig"),
    ("gläubiglicher", "glaubig"),
    ("großlichkeit", "grosslich"),
    ("grundsätzlich", "grundsatz"),
    ("grünem", "grun"),
    ("grünigend", "grunig"),
    ("grünlich", "grunlich"),
    ("grünlicher", "grunlich"),
    ("hauser", "haus"),
    ("hausern", "haus"),
    ("hausigkeit", "hausig"),
    ("hauskeiten", "hauskeit"),
    ("hauste", "haust"),
    ("hausten", "haust"),
    ("hausung", "hausung"),
    ("heißigung", "heissig"),
    ("heißs", "heisss"),
    ("heißste", "heissst"),
    ("heißtet", "heisstet"),
    ("herrlichigend", "herrlich"),
    ("herrlichigkeiten", "herrlich"),
    ("herrlichigung", "herrlich"),
    ("herrlichten", "herrlicht"),
    ("herrlichung", "herrlich"),
    ("herrlichungen", "herrlich"),
    ("hundernd", "hundernd"),
    ("hör", "hor"),
    ("hörern", "hor"),
    ("hörernd", "horernd"),
    ("hörlich", "horlich"),
    ("hörnisse", "horniss"),
    ("hörnisses", "horniss"),
    ("hörte", "hort"),
    ("jahrem", "jahr"),
    ("jahrest", "jahr"),
    ("jahret", "jahret"),
    ("jahrs", "jahr"),
    ("jahrt", "jahrt"),
    ("kann", "kann"),
    ("kategoriem", "kategori"),
    ("kategoriigkeit", "kategori"),
    ("kategorist", "kategorist"),
    ("kategoriten", "kategorit"),
    ("katzem", "katz"),
    ("katzheit", "katzheit"),
    ("katzigkeiten", "katzig"),
    ("landnisse", "landniss"),
    ("landnisses", "landniss"),
]


def test_reference_golden_sample():
    bad = [(w, stem(w), x) for w, x in GOLDENS if stem(w) != x]
    assert not bad, bad[:10]


def test_umlaut_and_eszett():
    assert stem("größe") == "gross"
    assert stem("straßen") == "strass"
    assert stem("fußbälle") == "fussball"


def test_case_discipline():
    # all-caps: no lowercase suffix matches, but the postlude still
    # lowercases capital U/Y (reference quirk, verified on the bundled
    # stemmer: ENTWICKLUNGEN -> ENTWICKLuNGEN, BAUM -> BAuM)
    assert stem("ENTWICKLUNGEN") == "ENTWICKLuNGEN"
    assert stem("BAUM") == "BAuM"
    assert stem("Entwicklungen") == "Entwicklung"


def test_analyzer_language_parameter():
    a = Analyzer("letter_unicode", lowercase=True, stem="german")
    toks = [t for t, _ in a.analyze("die Entwicklungen der Schönheit")]
    assert "entwickl" in toks and "schonheit" in toks


def test_algorithm_name_resolution():
    # names are lowercased before lookup (stem_filter_new,
    # c/src/analysis.c:1458-1464; accepted-spelling golden
    # tc_token_stream.rb:489)
    assert get_stemmer("GeRmAn")("laufen") == "lauf"
    assert get_stemmer("ENGLISH")("running") == "run"
    assert get_stemmer(True)("running") == "run"
    # invalid name raises (ArgumentError parity, tc_token_stream.rb:491)
    with pytest.raises(ValueError):
        get_stemmer("Jibberish")
    # valid libstemmer name this port does not implement: declared
    # divergence — reference would construct, we raise NotImplementedError
    with pytest.raises(NotImplementedError):
        get_stemmer("TurKisH")
    # the tc_token_stream accepted-spelling golden now resolves for real
    # (tc_token_stream.rb:489 constructs StemFilter with 'HunGarIaN')
    assert get_stemmer("HunGarIaN") is not None
