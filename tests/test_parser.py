"""Parser goldens for the reference grammar fixtures
(daemon/src/query/parsing.rs:92-106, query.pest)."""

import pytest

from admarus_spark.query import Filter, NAmong, Not, ParseError, Word, parse_query


def strip(c):
    """Structural form ignoring rule tags."""
    if isinstance(c, Word):
        return ("w", c.word)
    if isinstance(c, Filter):
        return ("f", c.name, c.value)
    if isinstance(c, Not):
        return ("not", strip(c.comp))
    if isinstance(c, NAmong):
        return ("n", c.n, tuple(strip(x) for x in c.among))
    raise TypeError


def test_quick_or_is_or():
    # bare juxtaposed words => OR (parsing.rs:49-57) — the surprising default
    q = parse_query("chloe helloco")
    assert strip(q.root) == ("n", 1, (("w", "chloe"), ("w", "helloco")))


def test_and_chain_flattens():
    q = parse_query("aaa AND bbb AND ccc")
    assert strip(q.root) == ("n", 3, (("w", "aaa"), ("w", "bbb"), ("w", "ccc")))


def test_paren_and_flattens_into_chain():
    # paren_comp is silent => (a AND b) AND c flattens like a AND b AND c,
    # with the reference's pop-then-extend child order
    q = parse_query("(aaa AND bbb) AND ccc")
    assert strip(q.root) == ("n", 3, (("w", "ccc"), ("w", "aaa"), ("w", "bbb")))


def test_operator_symbols():
    assert strip(parse_query("aaa + bbb").root) == ("n", 2, (("w", "aaa"), ("w", "bbb")))
    assert strip(parse_query("aaa & bbb").root) == ("n", 2, (("w", "aaa"), ("w", "bbb")))
    assert strip(parse_query("aaa / bbb").root) == ("n", 1, (("w", "aaa"), ("w", "bbb")))
    assert strip(parse_query("aaa | bbb").root) == ("n", 1, (("w", "aaa"), ("w", "bbb")))


def test_parsing_rs_fixture_1():
    q = parse_query(
        "word AND (word AND word) OR other AND 3(word, NOT(word2), word3) AND NOT word AND lang=en"
    )
    # right-recursive: word AND ( (word AND word) OR (other AND 3(...) AND NOT(...)) )
    root = q.root
    assert isinstance(root, NAmong) and root.n == 2
    assert strip(root.among[0]) == ("w", "word")
    orr = root.among[1]
    assert isinstance(orr, NAmong) and orr.n == 1


def test_parsing_rs_fixture_2():
    q = parse_query("word AND test AND test AND 2(word, word, word) AND NOT(word) AND lang=en")
    root = q.root
    assert isinstance(root, NAmong) and root.n == 5
    assert strip(root.among[3]) == ("n", 2, (("w", "word"),) * 3)
    # NOT is greedy over the rest of the chain (PEG comp recursion)
    assert strip(root.among[4]) == ("not", ("n", 2, (("w", "word"), ("f", "lang", "en"))))


def test_filter_not_lowercased():
    q = parse_query("Lang=EN")
    assert strip(q.root) == ("f", "Lang", "EN")


def test_words_lowercased():
    assert strip(parse_query("HELLO").root) == ("w", "hello")


def test_escaped_space():
    assert strip(parse_query(r"aaa\ bbb").root) == ("w", "aaa bbb")
    assert strip(parse_query(r"a\\b").root) == ("w", "a\\b")


def test_namong_with_spaces():
    q = parse_query("2 ( aaa , bbb , ccc )")
    assert strip(q.root) == ("n", 2, (("w", "aaa"), ("w", "bbb"), ("w", "ccc")))


def test_extraction_methods():
    q = parse_query("aaa AND bbb AND 2(ccc, NOT(ddd), eee) AND NOT fff AND lang=en")
    # NOT is greedy: NOT(fff AND lang=en)
    assert q.positive_terms() == ["aaa", "bbb", "ccc", "eee"]
    assert q.terms() == ["aaa", "bbb", "ccc", "ddd", "eee", "fff"]
    assert q.positive_filters() == []


def test_positive_filters_outside_not():
    q = parse_query("lang=en AND aaa")
    assert q.positive_filters() == [("lang", "en")]
    assert q.positive_terms() == ["aaa"]


@pytest.mark.parametrize("bad_n0", ["0(aaa, bbb)", "aaa AND 0(bbb, ccc)", "00(aaa)"])
def test_namong_n_zero_rejected(bad_n0):
    """n=0 divides by zero in every scoring path (and can never return
    results in the reference either, matching.rs:49-60) — a clean parse
    error, not a runtime DIVIDE_BY_ZERO in the Catalyst fold."""
    with pytest.raises(ParseError):
        parse_query(bad_n0)


@pytest.mark.parametrize("bad", ["aaa AND", "(open", "3(aaa", "", "AND"])
def test_parse_errors(bad):
    if bad == "AND":
        # a lone AND parses as the word "and" (word chars include letters)
        assert strip(parse_query(bad).root) == ("w", "and")
    else:
        with pytest.raises(ParseError):
            parse_query(bad)
