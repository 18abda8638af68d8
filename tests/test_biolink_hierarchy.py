"""Derived Biolink depth map (functions/biolink.py) + F13 consolidation
over it — replaces the round-1 hand-maintained 12-entry depth table."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_microbe_spark.functions.biolink import BIOLINK_IS_A, compute_depths
from kg_microbe_spark.operators.kgx_schema import consolidate_category_col


def test_depths_follow_is_a_chains():
    d = compute_depths()
    assert d["biolink:NamedThing"] == 0
    # every mapped class sits exactly one below its parent
    for child, parent in BIOLINK_IS_A.items():
        if parent is not None:
            assert d[child] == d[parent] + 1, (child, parent)
    # reference example: SmallMolecule deeper than ChemicalEntity
    assert d["biolink:SmallMolecule"] > d["biolink:ChemicalEntity"]
    # chains the old static table got flat: Drug below MolecularMixture
    # below ChemicalMixture below ChemicalEntity
    assert (
        d["biolink:Drug"]
        > d["biolink:MolecularMixture"]
        > d["biolink:ChemicalMixture"]
        > d["biolink:ChemicalEntity"]
    )
    # mixin-only classes are NOT in the map (reference BFS can't reach them)
    assert "biolink:OntologyClass" not in d


def test_consolidation_uses_derived_depths(spark):
    cells = [
        "biolink:ChemicalEntity|biolink:SmallMolecule",
        "biolink:Drug|biolink:ChemicalEntity|biolink:NamedThing",
        # ties among categories the OLD static table didn't list at all:
        "biolink:Protein|biolink:Gene",       # Protein (depth 3) beats Gene (2)
        "biolink:Enzyme|biolink:Unlisted",    # all-unknown → sorted-first, fail open
        "biolink:Pathway|biolink:BiologicalProcess",
    ]
    df = spark.createDataFrame([(c,) for c in cells], "category string")
    got = [r.c for r in df.select(consolidate_category_col(F.col("category")).alias("c")).collect()]
    assert got == [
        "biolink:SmallMolecule",
        "biolink:Drug",
        "biolink:Protein",
        "biolink:Enzyme",
        "biolink:Pathway",
    ]


def test_yaml_loader_preserves_acronyms(tmp_path):
    # 'RNA product' must become biolink:RNAProduct (not RnaProduct) or its
    # depth is keyed on a name no emitted category ever matches (ADVICE r2).
    from kg_microbe_spark.functions.biolink import load_is_a_from_yaml

    y = tmp_path / "biolink-model.yaml"
    y.write_text(
        "classes:\n"
        "  named thing: {}\n"
        "  RNA product:\n"
        "    is_a: named thing\n"
        "  small molecule:\n"
        "    is_a: named thing\n"
    )
    parents = load_is_a_from_yaml(str(y))
    assert parents["biolink:RNAProduct"] == "biolink:NamedThing"
    assert parents["biolink:SmallMolecule"] == "biolink:NamedThing"
