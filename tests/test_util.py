from ferenda_ray import util


def test_normalize_space():
    assert util.normalize_space("  a\n\t b   c ") == "a b c"
    assert util.normalize_space("\xa0x\xa0") == "x"


def test_split_numalpha_ordering():
    assert util.split_numalpha("6 a") < util.split_numalpha("7")
    assert util.split_numalpha("7") < util.split_numalpha("10")


def test_numalpha_sortkey_matches_split():
    vals = ["6 a", "7", "10", "2", "10 b", "1.2", "1.10"]
    by_split = sorted(vals, key=util.split_numalpha)
    by_key = sorted(vals, key=util.numalpha_sortkey)
    assert by_split == by_key


def test_title_sortkey():
    assert util.title_sortkey("The Wild, Wild Web") == "wildwildweb"


def test_roman_roundtrip():
    for n in (1, 4, 9, 14, 40, 90, 400, 1990, 3999):
        assert util.from_roman(util.to_roman(n)) == n
    assert util.is_roman("XIV")
    assert not util.is_roman("XIIII")
    assert not util.is_roman("hello")


def test_ordinal_increment():
    assert util.ordinal_increment("6") == "7"
    assert util.ordinal_increment("6a") == "6b"
    assert util.ordinal_increment("6 a") == "6 b"


def test_base27():
    for n in (0, 1, 26, 27, 12345):
        assert util.base27decode(util.base27encode(n)) == n


def test_uri_leaf():
    assert util.uri_leaf("http://a/b#c") == "c"
    assert util.uri_leaf("http://a/b/c") == "c"


def test_slugify():
    assert util.slugify("Acme Corporation") == "acme-corporation"
    assert util.slugify("Åke & Söner AB") == "ake-soner-ab"


def test_hash64_stable():
    assert util.hash64("abc") == util.hash64("abc")
    assert util.hash64("abc") != util.hash64("abd")
    assert 0 <= util.stable_uint("xyz", 64) < 64
