"""Pure-Python Aho-Corasick automaton for dictionary mention detection.

This is the executor-side matcher behind Stage 3 (SURVEY.md §2.9 N2): the
lexicon's normalized surface forms are compiled into one automaton on the
driver, broadcast once, and each executor scans Arrow batches of page text
through it inside ``mapInPandas``. The automaton is picklable (plain dicts)
so ``spark.sparkContext.broadcast`` ships it once per executor, mirroring
the reference's load-dimension-data-up-front pattern
(/root/reference/kg_microbe/transform_utils/bacdive/bacdive.py:224-321) but
distributed.

Matching semantics (fixed, and mirrored exactly by the pytest oracle):
- input text must already be normalized (lower + Greek→ASCII,
  ``normalize_text_py``); patterns are lexicon ``term_norm`` strings;
- only matches at **word boundaries** count (both ends), where a word char
  is ``[a-z0-9_]`` — a match for "coli" inside "colic" is not a mention;
- overlapping matches are resolved **leftmost-longest**: scan positions
  left to right, at each position keep the longest boundary-valid match,
  then continue after its end (non-overlapping), the classic dictionary
  NER rule. Distinct surfaces therefore never overlap within a page.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence, Tuple

_WORD_CHARS = frozenset("abcdefghijklmnopqrstuvwxyz0123456789_")


def _is_word_char(ch: str) -> bool:
    return ch in _WORD_CHARS


class AhoCorasick:
    """Classic trie + failure-link automaton over unicode code points."""

    __slots__ = ("goto", "fail", "out")

    def __init__(self, patterns: Sequence[str]):
        # goto: list of dict[char -> state]; out: state -> list of pattern lengths
        self.goto: List[Dict[str, int]] = [{}]
        self.out: List[List[int]] = [[]]
        for pat in patterns:
            if not pat:
                continue
            state = 0
            for ch in pat:
                nxt = self.goto[state].get(ch)
                if nxt is None:
                    nxt = len(self.goto)
                    self.goto[state][ch] = nxt
                    self.goto.append({})
                    self.out.append([])
                state = nxt
            if len(pat) not in self.out[state]:
                self.out[state].append(len(pat))
        # BFS failure links
        self.fail: List[int] = [0] * len(self.goto)
        queue: List[int] = []
        for ch, s in self.goto[0].items():
            self.fail[s] = 0
            queue.append(s)
        qi = 0
        while qi < len(queue):
            r = queue[qi]
            qi += 1
            for ch, s in self.goto[r].items():
                queue.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0)
                if self.fail[s] == s:
                    self.fail[s] = 0
                # merge outputs along failure links
                for ln in self.out[self.fail[s]]:
                    if ln not in self.out[s]:
                        self.out[s].append(ln)

    def iter_raw_matches(self, text: str) -> Iterator[Tuple[int, int]]:
        """Yield (start, end) for every pattern occurrence (end exclusive),
        in increasing end order. No boundary/overlap filtering here."""
        state = 0
        goto = self.goto
        fail = self.fail
        out = self.out
        for i, ch in enumerate(text):
            while state and ch not in goto[state]:
                state = fail[state]
            state = goto[state].get(ch, 0)
            if out[state]:
                for ln in out[state]:
                    yield (i + 1 - ln, i + 1)

    def find_mentions(self, text: str) -> List[Tuple[int, int, str]]:
        """Boundary-valid, leftmost-longest, non-overlapping mentions.

        Returns [(start, end, surface)] sorted by start.
        """
        n = len(text)
        # longest boundary-valid match starting at each position
        best_end: Dict[int, int] = {}
        for s, e in self.iter_raw_matches(text):
            if s > 0 and _is_word_char(text[s - 1]) and _is_word_char(text[s]):
                continue
            if e < n and _is_word_char(text[e - 1]) and _is_word_char(text[e]):
                continue
            if e > best_end.get(s, -1):
                best_end[s] = e
        result: List[Tuple[int, int, str]] = []
        pos = 0
        for s in sorted(best_end):
            if s < pos:
                continue
            e = best_end[s]
            result.append((s, e, text[s:e]))
            pos = e
        return result


def build_automaton(patterns: Sequence[str]) -> AhoCorasick:
    """Dedup + build. Deterministic for any input order."""
    return AhoCorasick(sorted(set(p for p in patterns if p)))


class FirstWordIndex:
    """Fast exact dictionary matcher: a one-level word trie + char-verify.

    Same semantics as :class:`AhoCorasick` (boundary-valid, leftmost-
    longest, non-overlapping) but ~10× faster in pure Python: tokenize the
    text once with a C-compiled regex (maximal ``[a-z0-9_]+`` runs — every
    boundary-valid match of a pattern that begins with a word char starts
    exactly at a token start), then for each token consult a dict of
    patterns keyed by their first word-run and verify the full pattern with
    ``str.startswith`` (also C). Patterns beginning with a non-word char
    (none in practice — F1 normalization strips punctuation except
    hyphens) fall back to a find() scan, so exactness holds for any input.
    """

    __slots__ = ("by_first_word", "odd_patterns")

    _TOKEN_RE = __import__("re").compile(r"[a-z0-9_]+")

    def __init__(self, patterns: Sequence[str]):
        by_first: Dict[str, List[str]] = {}
        odd: List[str] = []
        for pat in sorted(set(p for p in patterns if p)):
            m = self._TOKEN_RE.match(pat)
            if m is None or m.start() != 0:
                odd.append(pat)
                continue
            by_first.setdefault(m.group(), []).append(pat)
        # longest first → the per-start max is found early (still checked all)
        for v in by_first.values():
            v.sort(key=len, reverse=True)
        self.by_first_word = by_first
        self.odd_patterns = odd

    def find_candidates(self, text: str) -> List[Tuple[int, int, str]]:
        """All boundary-valid matches, longest-per-start, sorted by start —
        WITHOUT the non-overlap resolution. The sharded scan unions these
        across pattern shards and resolves leftmost-longest globally
        (resolution is only correct over the *full* pattern set)."""
        n = len(text)
        by_first = self.by_first_word
        best_end: Dict[int, int] = {}
        for m in self._TOKEN_RE.finditer(text):
            cands = by_first.get(m.group())
            if not cands:
                continue
            s = m.start()
            for pat in cands:
                e = s + len(pat)
                if e > n or not text.startswith(pat, s):
                    continue
                if e < n and _is_word_char(text[e - 1]) and _is_word_char(text[e]):
                    continue
                # start boundary holds by construction (token start)
                best_end[s] = e  # first hit is the longest (sorted desc)
                break
        for pat in self.odd_patterns:
            start = 0
            while True:
                s = text.find(pat, start)
                if s < 0:
                    break
                e = s + len(pat)
                start = s + 1
                if s > 0 and _is_word_char(text[s - 1]) and _is_word_char(text[s]):
                    continue
                if e < n and _is_word_char(text[e - 1]) and _is_word_char(text[e]):
                    continue
                if e > best_end.get(s, -1):
                    best_end[s] = e
        return [(s, best_end[s], text[s : best_end[s]]) for s in sorted(best_end)]

    def find_mentions(self, text: str) -> List[Tuple[int, int, str]]:
        result: List[Tuple[int, int, str]] = []
        pos = 0
        for s, e, surface in self.find_candidates(text):
            if s < pos:
                continue
            result.append((s, e, surface))
            pos = e
        return result


def build_matcher(patterns: Sequence[str]) -> FirstWordIndex:
    """The production matcher for Stage 3 (broadcastable)."""
    return FirstWordIndex(patterns)


def find_mentions_bruteforce(text: str, patterns: Sequence[str]) -> List[Tuple[int, int, str]]:
    """Oracle-side reference implementation: O(patterns × text) substring
    scan with identical boundary and leftmost-longest rules. Used only in
    tests to verify the automaton."""
    n = len(text)
    best_end: Dict[int, int] = {}
    for pat in set(patterns):
        if not pat:
            continue
        start = 0
        while True:
            s = text.find(pat, start)
            if s < 0:
                break
            e = s + len(pat)
            start = s + 1
            if s > 0 and _is_word_char(text[s - 1]) and _is_word_char(text[s]):
                continue
            if e < n and _is_word_char(text[e - 1]) and _is_word_char(text[e]):
                continue
            if e > best_end.get(s, -1):
                best_end[s] = e
    result: List[Tuple[int, int, str]] = []
    pos = 0
    for s in sorted(best_end):
        if s < pos:
            continue
        e = best_end[s]
        result.append((s, e, text[s:e]))
        pos = e
    return result
