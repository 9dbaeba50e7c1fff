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


def test_collate_sortkey_fallback_chain():
    """ICU and sv_SE locale are absent in this container, so the key
    falls back to the title_sortkey bytes — and stays a usable, stable
    sort key either way."""
    from ferenda_ray.util import collate_sortkey, title_sortkey

    ks = [collate_sortkey(s) for s in ["The Zebra", "apple", "Äpple"]]
    assert all(isinstance(k, bytes) for k in ks)
    assert collate_sortkey("apple") == collate_sortkey("apple")
    # fallback equals the approximation's bytes in this environment
    try:
        import icu  # noqa: F401
        has_icu = True
    except ImportError:
        has_icu = False
    if not has_icu:
        import locale as _loc
        try:
            _loc.setlocale(_loc.LC_COLLATE, "sv_SE.UTF-8")
            has_locale = True
            _loc.setlocale(_loc.LC_COLLATE, "C")
        except Exception:
            has_locale = False
        if not has_locale:
            assert collate_sortkey("The Zebra") == \
                title_sortkey("The Zebra").encode()
