"""Automaton vs brute-force matcher equivalence + boundary semantics."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from kg_microbe_spark.functions.automaton import (
    build_automaton,
    build_matcher,
    find_mentions_bruteforce,
)


def test_word_boundaries():
    ac = build_automaton(["coli", "escherichia coli", "soil"])
    # 'coli' inside 'colic' must not match; multi-word leftmost-longest wins
    text = "escherichia coli in colic soil soils"
    got = ac.find_mentions(text)
    assert got == [(0, 16, "escherichia coli"), (26, 30, "soil")]
    assert got == find_mentions_bruteforce(text, ["coli", "escherichia coli", "soil"])


def test_leftmost_longest_non_overlapping():
    ac = build_automaton(["a b", "b c d", "c d"])
    text = "a b c d"
    # at pos 0 longest is "a b"; next start after end=3 is "c d"
    assert ac.find_mentions(text) == [(0, 3, "a b"), (4, 7, "c d")]


def test_hyphen_is_boundary():
    ac = build_automaton(["beta", "beta-d-glucose"])
    assert ac.find_mentions("x-beta-d-glucose y") == [(2, 16, "beta-d-glucose")]


WORDS = ["soil", "glucose", "coli", "escherichia coli", "hot spring", "a", "ab", "abc", "b", "spring"]


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 10 ** 9))
def test_automaton_matches_bruteforce_random(seed):
    rng = random.Random(seed)
    vocab = rng.sample(WORDS, rng.randint(1, len(WORDS)))
    text = " ".join(rng.choice(WORDS + ["filler", "xx", "soils", "colic"]) for _ in range(rng.randint(0, 40)))
    ac = build_automaton(vocab)
    fw = build_matcher(vocab)
    expected = find_mentions_bruteforce(text, vocab)
    assert ac.find_mentions(text) == expected
    assert fw.find_mentions(text) == expected


def test_firstword_matcher_on_synthetic_corpus():
    """FirstWordIndex ≡ AhoCorasick on the real lexicon + real pages."""
    from kg_microbe_spark.functions.normalize import normalize_name_py
    from kg_microbe_spark.oracle import build_oracle_index
    from kg_microbe_spark.sources.synthetic import build_lexicon, iter_pages

    pats = list(build_oracle_index(build_lexicon()).keys())
    ac, fw = build_automaton(pats), build_matcher(pats)
    for rec in iter_pages(80):
        t = normalize_name_py(rec["text"] or "")
        assert ac.find_mentions(t) == fw.find_mentions(t)
