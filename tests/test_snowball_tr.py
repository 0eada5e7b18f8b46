# -*- coding: utf-8 -*-
"""Snowball Turkish stemmer goldens (bundled-libstemmer behavior): the
full 181k-word mixed-case sweep (suffix grids, ki-chains, reserved words,
d/g endings, random strings) had zero mismatches against the compiled
c/lib/libstemmer_c stem_UTF_8_turkish."""

from ferret_spark.snowball import get_stemmer
from ferret_spark.snowball_tr import stem


GOLDENS = [
    ("kitap", "kitap"),
    ("kitaplar", "kitap"),
    ("kitapları", "kitap"),
    ("kitaplarında", "kitap"),
    ("kitaplarındaki", "kitap"),
    ("evlerinden", "ev"),
    ("evdekiler", "evdeki"),
    ("evimizdeki", "ev"),
    ("gözlerim", "göz"),
    ("gözlüklerimiz", "gözlük"),
    ("arabaya", "araba"),
    ("arabasıyla", "araba"),
    ("okuldan", "okul"),
    ("okullardaki", "okul"),
    ("çocukları", "çocuk"),
    ("çocuklarımızın", "çocuk"),
    ("güllerin", "gül"),
    ("şehirdeki", "şehir"),
    ("türkçe", "türkçe"),
    ("kedileri", "kedi"),
    ("ağaçlar", "ağaç"),
    ("ağacı", "ağaç"),
    ("sorular", "soru"),
    ("sorusu", "sorus"),
    ("günlerde", "gün"),
    ("elinde", "el"),
    ("sütü", "süt"),
    ("ordunun", "ordu"),
    ("köylerden", "köy"),
    ("kapıyı", "kapı"),
    ("denizlere", "deniz"),
    ("yollarda", "yol"),
    ("geliyormuş", "geliyor"),
    ("gelmişsiniz", "gel"),
    ("geldiler", "gel"),
    ("gidecekmiş", "gidecek"),
    ("okuyordu", "okuyor"),
    ("yapacaksınız", "yapacak"),
    ("yaptıklarımız", "yaptık"),
    ("anlamadım", "anlamadı"),
    ("bilmiyorsun", "bilmiyor"),
    ("konuşurken", "konuşur"),
    ("çalışıyorken", "çalışıyor"),
    ("oldukça", "oldukça"),
    ("güzelce", "güzel"),
    ("hızlıca", "hızlıç"),
    ("adamcasına", "adamca"),
    ("delicesine", "delice"),
    ("iyiymiş", "i"),
    ("kötüydü", "köt"),
    ("hastaysa", "has"),
    ("öğretmendir", "öğretme"),
    ("doktordur", "doktor"),
    ("öğrencisiniz", "öğrenci"),
    ("arkadaşım", "arkadaş"),
    ("dünyanın", "dünya"),
    ("ülkemizde", "ülke"),
    # reserved words: stems equal to ad/soyad skip the postlude
    ("soyadı", "soyad"),
    ("soyadlar", "soyad"),
    ("adlar", "ad"),
    ("adında", "ad"),
    ("ad", "ad"),
    ("soyad", "soyad"),
    ("suyu", "su"),
    ("dağdaki", "dak"),
    ("renkli", "renkli"),
    ("kalemden", "kale"),
    ("defterlerini", "defter"),
    ("pencereye", "pencere"),
    ("bahçede", "bahçe"),
    ("ağaçtan", "ağaç"),
    ("yapraklar", "yaprak"),
    ("çiçeklerle", "çiçek"),
    ("kuşların", "kuş"),
    # no case folding: uppercase vowels are not vowels to the stemmer
    ("GÜZEL", "GÜZEL"),
    ("Kitaplar", "Kitap"),
    ("İstanbul", "İstanbul"),
    ("ANKARA", "ANKARA"),
    ("ığdır", "ık"),
    # single-syllable words are returned untouched
    ("ab", "ab"),
    ("ac", "ac"),
    ("ag", "ag"),
    ("ıd", "ıd"),
    ("dg", "dg"),
    ("o", "o"),
    ("bu", "bu"),
    ("şu", "şu"),
    ("ne", "ne"),
    ("ki", "ki"),
    ("de", "de"),
    ("mi", "mi"),
    # append_U after d/g stems (postlude)
    ("kebapd", "kebapdı"),
    ("uzung", "uzungu"),
]


def test_goldens():
    bad = [(w, want, stem(w)) for w, want in GOLDENS if stem(w) != want]
    assert not bad, bad


def test_registry_resolves():
    s = get_stemmer("turkish")
    assert s("evlerinden") == "ev"
    assert s("kitapları") == "kitap"


def test_idempotent_on_stems():
    # a second pass over already-stemmed output must be stable for plain
    # noun stems (suffixless forms with >=2 vowels and no trailing d/g)
    for w in ("kitap", "okul", "araba", "deniz", "yaprak"):
        assert stem(stem(w)) == stem(w)
