"""Pure-Python oracle: reference-semantics triple extraction on lists.

Independent of Spark (FIXTURES.md §3) — reimplements N1-N8, P4, P5, P7,
P10, W4, A2, A6, F1 on plain Python structures, using the brute-force
substring matcher (not the automaton) so the two sides share as little code
as possible. The pytest P/R gate compares its triple set against the Spark
pipeline's.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Optional, Set, Tuple

from kg_microbe_spark.functions.automaton import find_mentions_bruteforce
from kg_microbe_spark.functions.normalize import normalize_name_py
from kg_microbe_spark.sources import synthetic

TAXON = "biolink:OrganismTaxon"
CHEM = "biolink:ChemicalEntity"
ENV = "biolink:EnvironmentalFeature"

SCORE_MAX = 4.01
BIN_WIDTH = 1e-4
BIN_COUNT = int(round(SCORE_MAX / BIN_WIDTH))
STAR_MAX = 4.0


def build_oracle_index(lexicon: List[Dict], stopwords=synthetic.STOPWORDS) -> Dict[str, Tuple[int, Dict]]:
    """term_norm → (rank, lexicon row); W4 winner = min (rank, curie)."""
    stop_norm = {normalize_name_py(s) for s in stopwords}
    index: Dict[str, Tuple[int, Dict]] = {}

    def offer(term_norm: str, rank: int, row: Dict) -> None:
        if not term_norm or term_norm in stop_norm:
            return
        cur = index.get(term_norm)
        if cur is None or (rank, row["curie"]) < (cur[0], cur[1]["curie"]):
            index[term_norm] = (rank, row)

    for row in lexicon:
        if row["deprecated"]:
            continue
        offer(normalize_name_py(row["label"]), 0, row)
        for syn in row["synonyms"]:
            offer(normalize_name_py(syn), 1, row)
        if row["category"] == CHEM:
            for surf in [row["label"]] + list(row["synonyms"]):
                fz = normalize_name_py(surf, strip_stereochemistry=True, strip_hydrate=True)
                if fz != normalize_name_py(surf):
                    offer(fz, 2, row)
    return index


def oracle_synonyms(lexicon: List[Dict]) -> Dict[str, str]:
    """Mirrors lexicon.enrich_synonyms: per canonical curie, the
    pipe-joined sorted distinct set of normalized surfaces (label +
    synonyms) from the row itself and every secondary xref-routed to it;
    deprecated rows contribute nothing."""
    sets: Dict[str, Set[str]] = defaultdict(set)
    for row in lexicon:
        if row["deprecated"]:
            continue
        target = row["curie"]
        if target.startswith("SECONDARY:") and row["xrefs"]:
            target = row["xrefs"][0]
        for surf in [row["label"]] + list(row["synonyms"]):
            if surf is None:
                continue
            n = normalize_name_py(surf)
            if n:
                sets[target].add(n)
    return {k: "|".join(sorted(v)) for k, v in sets.items()}


def _channel(url: str) -> str:
    site = int(url.split("https://site")[1].split(".")[0])
    if site < 8:
        return "environmental_samples"
    if site < 16:
        return "genomes_isolates"
    return "literature"


def _source(url: str) -> str:
    return "infores:site" + url.split("https://site")[1].split(".")[0]


def oracle_edges(n_pages: int, tau: float = 0.0):
    """Returns (edges, nodes, drop_counts) where edges is a dict keyed on
    (subject, predicate, object) → provenance dict."""
    lexicon = synthetic.build_lexicon()
    hubs = synthetic.hub_terms(lexicon)
    index = build_oracle_index(lexicon)
    curie_to_row = {r["curie"]: r for r in lexicon}
    curated = synthetic.curated_pair_predicates()
    defaults = synthetic.CATEGORY_DEFAULT_PREDICATES

    # pages: url dedup keep max warc_ts; lang routing
    by_url: Dict[str, Dict] = {}
    for pid in range(n_pages):
        rec = synthetic.page_record(pid, lexicon, hubs)
        prev = by_url.get(rec["url"])
        if prev is None or rec["warc_ts"] > prev["warc_ts"]:
            by_url[rec["url"]] = rec

    patterns = list(index.keys())
    raw_edges: List[Dict] = []
    node_sources: Dict[str, Set[str]] = defaultdict(set)
    node_meta: Dict[str, Tuple[str, str]] = {}
    drop_counts: Dict[str, int] = defaultdict(int)

    for url, rec in by_url.items():
        if rec["lang"] != "en":
            continue
        text = synthetic.extract_text_from_html(rec["html"])
        norm = normalize_name_py(text)
        counts: Dict[str, int] = defaultdict(int)
        for _s, _e, surface in find_mentions_bruteforce(norm, patterns):
            counts[surface] += 1
        # link + canonicalize
        ent: Dict[str, Dict] = {}
        for term_norm, n in counts.items():
            rank, row = index[term_norm]
            curie, label, category = row["curie"], row["label"], row["category"]
            if curie.startswith("SECONDARY:") and row["xrefs"]:
                dst = curie_to_row.get(row["xrefs"][0])
                if dst is not None:
                    curie, label, category = dst["curie"], dst["label"], dst["category"]
            e = ent.setdefault(curie, dict(curie=curie, label=label, category=category, n=0))
            e["n"] += n
            e["label"] = min(e["label"], label)
        src = _source(url)
        channel = _channel(url)
        for c in ent.values():
            node_sources[c["curie"]].add(src)
            node_meta[c["curie"]] = (c["label"], c["category"])
        # ordered pairs + P4
        ents = list(ent.values())
        for a in ents:
            for b in ents:
                if a["curie"] == b["curie"]:
                    continue
                sc, oc = a["category"], b["category"]
                if sc == TAXON and oc == CHEM:
                    outcome = "taxon_to_chemical"
                elif sc == ENV and oc == TAXON:
                    outcome = "environment_to_taxon"
                elif sc == CHEM and oc == TAXON:
                    drop_counts["inverse_chemical_to_taxon"] += 1
                    continue
                elif sc == TAXON and oc == ENV:
                    drop_counts["inverse_taxon_to_environment"] += 1
                    continue
                elif sc == TAXON and oc == TAXON:
                    drop_counts["taxon_taxon_cooccurrence"] += 1
                    continue
                else:
                    drop_counts["unknown_shape"] += 1
                    continue
                pred, rel = curated.get(
                    (a["curie"], b["curie"]),
                    defaults.get((sc, oc), synthetic.FALLBACK_PREDICATE),
                )
                score = float(a["n"] * b["n"])
                if channel == "literature":
                    evidence = "publication"
                elif channel == "genomes_isolates":
                    evidence = "habitat" if oc == ENV else "resource_class"
                else:
                    evidence = "sample_count"
                if evidence == "publication" or channel == "literature":
                    kl, at = "prediction", "text_mining_agent"
                elif channel == "environmental_samples":
                    kl, at = "statistical_association", "data_analysis_pipeline"
                elif channel == "genomes_isolates":
                    kl, at = ("observation", "automated_agent") if evidence == "habitat" else ("knowledge_assertion", "automated_agent")
                else:
                    kl, at = "not_provided", "not_provided"
                raw_edges.append(
                    dict(
                        subject=a["curie"],
                        predicate=pred,
                        object=b["curie"],
                        relation=rel,
                        primary_knowledge_source=src,
                        knowledge_level=kl,
                        agent_type=at,
                        score=score,
                        channel=channel,
                        outcome=outcome,
                    )
                )

    # A6/P7 calibration
    if tau > 0.0:
        hists: Dict[str, Dict[int, int]] = defaultdict(lambda: defaultdict(int))
        for e in raw_edges:
            if e["channel"] == "environmental_samples":
                hists[e["primary_knowledge_source"]][_bin(e["score"])] += 1
        cutoffs: Dict[str, int] = {}
        for res, bins in hists.items():
            n = sum(bins.values())
            target = (tau / STAR_MAX) * n
            cum = 0
            cut = BIN_COUNT
            for idx in sorted(bins):
                cum += bins[idx]
                if cum >= target:
                    cut = idx
                    break
            cutoffs[res] = cut
        kept_edges = []
        for e in raw_edges:
            if e["channel"] == "environmental_samples":
                if _bin(e["score"]) >= cutoffs.get(e["primary_knowledge_source"], 0):
                    kept_edges.append(e)
            elif e["channel"] == "genomes_isolates":
                if 4.0 >= tau:
                    kept_edges.append(e)
            elif e["channel"] == "literature":
                if 3.0 >= tau:
                    kept_edges.append(e)
            else:
                kept_edges.append(e)
        raw_edges = kept_edges

    # merge: first-wins (MIN) per triple
    merged: Dict[Tuple[str, str, str], Dict] = {}
    for e in raw_edges:
        k = (e["subject"], e["predicate"], e["object"])
        cur = merged.get(k)
        if cur is None:
            merged[k] = dict(e, n_sources=1)
        else:
            cur["n_sources"] += 1
            for col in ("relation", "primary_knowledge_source", "knowledge_level", "agent_type"):
                cur[col] = min(cur[col], e[col])

    syn_map = oracle_synonyms(lexicon)
    nodes = {
        curie: dict(
            id=curie,
            category=node_meta[curie][1],
            name=node_meta[curie][0],
            provided_by=min(srcs),
            synonym=syn_map.get(curie, ""),
        )
        for curie, srcs in node_sources.items()
    }
    return merged, nodes, dict(drop_counts)


def _bin(score: float) -> int:
    if not math.isfinite(score) or score <= 0.0:
        return 0
    return min(int(score / BIN_WIDTH), BIN_COUNT - 1)


def oracle_triples(n_pages: int, tau: float = 0.0) -> Set[Tuple[str, str, str]]:
    merged, _nodes, _drops = oracle_edges(n_pages, tau)
    return set(merged.keys())


def precision_recall(predicted: Set[Tuple[str, str, str]], expected: Set[Tuple[str, str, str]]) -> Tuple[float, float]:
    if not predicted:
        return (0.0, 0.0 if expected else 1.0)
    tp = len(predicted & expected)
    return tp / len(predicted), (tp / len(expected)) if expected else 1.0
