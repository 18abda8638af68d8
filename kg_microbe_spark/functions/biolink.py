"""Biolink category hierarchy — depth via BFS over an ``is_a`` parent map.

Re-expresses the reference's hierarchy walk (utils/biolink_hierarchy.py:
86-110 builds parent/children maps from biolink-model.yaml and BFS-computes
depth from the "named thing" root; get_most_specific_category picks max
depth with a first-category fallback for unknowns).

This engine ships the ``is_a`` chains as data (public Biolink Model class
hierarchy, restricted to the categories kg-microbe emits plus their
ancestors) and derives depths by the SAME BFS — so consolidation no longer
relies on a hand-maintained depth table (round-1 gap: 12 hard-coded depths
mis-ranked ties among unlisted categories). Classes the model reaches only
via mixins (OntologyClass, ChemicalRole) and non-model labels the reference
also fails to resolve (Enzyme, GrowthMedium, Macromolecule) are absent by
design: both engines fall back identically (fail open).

``load_is_a_from_yaml`` accepts a real biolink-model.yaml when one is
available (same key shape the reference reads: classes.<name>.is_a).
"""

from __future__ import annotations

from collections import deque
from typing import Dict, Mapping, Optional

_B = "biolink:"

# child → parent (is_a), PascalCase with prefix. Root: NamedThing.
BIOLINK_IS_A: Dict[str, Optional[str]] = {
    f"{_B}NamedThing": None,
    # --- attributes -------------------------------------------------------
    f"{_B}Attribute": f"{_B}NamedThing",
    f"{_B}OrganismAttribute": f"{_B}Attribute",
    f"{_B}PhenotypicQuality": f"{_B}OrganismAttribute",
    # --- taxa / biological entities --------------------------------------
    f"{_B}OrganismTaxon": f"{_B}NamedThing",
    f"{_B}BiologicalEntity": f"{_B}NamedThing",
    f"{_B}OrganismalEntity": f"{_B}BiologicalEntity",
    f"{_B}IndividualOrganism": f"{_B}OrganismalEntity",
    f"{_B}AnatomicalEntity": f"{_B}OrganismalEntity",
    f"{_B}GrossAnatomicalStructure": f"{_B}AnatomicalEntity",
    f"{_B}Cell": f"{_B}AnatomicalEntity",
    f"{_B}CellularComponent": f"{_B}AnatomicalEntity",
    f"{_B}DiseaseOrPhenotypicFeature": f"{_B}BiologicalEntity",
    f"{_B}Disease": f"{_B}DiseaseOrPhenotypicFeature",
    f"{_B}PhenotypicFeature": f"{_B}DiseaseOrPhenotypicFeature",
    f"{_B}Gene": f"{_B}BiologicalEntity",
    f"{_B}GeneFamily": f"{_B}BiologicalEntity",
    f"{_B}Genome": f"{_B}BiologicalEntity",
    f"{_B}MacromolecularComplex": f"{_B}BiologicalEntity",
    f"{_B}Polypeptide": f"{_B}BiologicalEntity",
    f"{_B}Protein": f"{_B}Polypeptide",
    # --- processes / activities ------------------------------------------
    f"{_B}BiologicalProcessOrActivity": f"{_B}BiologicalEntity",
    f"{_B}BiologicalProcess": f"{_B}BiologicalProcessOrActivity",
    f"{_B}Pathway": f"{_B}BiologicalProcess",
    f"{_B}PhysiologicalProcess": f"{_B}BiologicalProcess",
    f"{_B}MolecularActivity": f"{_B}BiologicalProcessOrActivity",
    f"{_B}Occurrent": f"{_B}NamedThing",
    f"{_B}ActivityAndBehavior": f"{_B}Occurrent",
    f"{_B}Activity": f"{_B}ActivityAndBehavior",
    f"{_B}Phenomenon": f"{_B}Occurrent",
    # --- chemicals ---------------------------------------------------------
    f"{_B}ChemicalEntity": f"{_B}NamedThing",
    f"{_B}ChemicalSubstance": f"{_B}ChemicalEntity",  # deprecated alias, kept resolvable
    f"{_B}MolecularEntity": f"{_B}ChemicalEntity",
    f"{_B}SmallMolecule": f"{_B}MolecularEntity",
    f"{_B}NucleicAcidEntity": f"{_B}MolecularEntity",
    f"{_B}ChemicalMixture": f"{_B}ChemicalEntity",
    f"{_B}MolecularMixture": f"{_B}ChemicalMixture",
    f"{_B}ComplexMolecularMixture": f"{_B}ChemicalMixture",
    f"{_B}Drug": f"{_B}MolecularMixture",
    f"{_B}Food": f"{_B}ChemicalMixture",
    f"{_B}ProcessedMaterial": f"{_B}ChemicalMixture",
    # --- environments ------------------------------------------------------
    f"{_B}PlanetaryEntity": f"{_B}NamedThing",
    f"{_B}EnvironmentalFeature": f"{_B}PlanetaryEntity",
    f"{_B}EnvironmentalProcess": f"{_B}PlanetaryEntity",
    f"{_B}GeographicLocation": f"{_B}PlanetaryEntity",
    # --- information -------------------------------------------------------
    f"{_B}InformationContentEntity": f"{_B}NamedThing",
    f"{_B}Publication": f"{_B}InformationContentEntity",
}


def compute_depths(is_a: Optional[Mapping[str, Optional[str]]] = None) -> Dict[str, int]:
    """BFS from the root exactly like the reference's _calculate_depths
    (biolink_hierarchy.py:100-109): depth(root)=0, child = parent+1.
    Classes not reachable from the root are omitted (→ callers fail open)."""
    is_a = is_a if is_a is not None else BIOLINK_IS_A
    children: Dict[str, list] = {}
    for child, parent in is_a.items():
        if parent is not None:
            children.setdefault(parent, []).append(child)
    # BFS from NamedThing ONLY (reference roots at "named thing"): classes
    # without an is_a chain to the root — mixins like OntologyClass — stay
    # out of the depth map in both engines.
    depths: Dict[str, int] = {}
    queue = deque([(f"{_B}NamedThing", 0)])
    while queue:
        cat, d = queue.popleft()
        depths[cat] = d
        for ch in sorted(children.get(cat, [])):
            queue.append((ch, d + 1))
    return depths


def load_is_a_from_yaml(path: str) -> Dict[str, Optional[str]]:
    """Optional: derive the parent map from a real biolink-model.yaml
    (classes.<name>.is_a, names in the model's spaced-lowercase form)."""
    import yaml

    with open(path) as f:
        schema = yaml.safe_load(f)

    def _pascal(name: str) -> str:
        # Preserve uppercase runs so acronym classes keep their casing
        # ('RNA product' -> 'RNAProduct', not 'RnaProduct') — otherwise
        # depths keyed on the mangled name never match emitted categories
        # and silently fail open to -1.
        return "".join(w if w.isupper() else w.capitalize() for w in name.split())

    out: Dict[str, Optional[str]] = {}
    for cname, cdef in (schema.get("classes") or {}).items():
        parent = (cdef or {}).get("is_a")
        out[f"{_B}{_pascal(cname)}"] = f"{_B}{_pascal(parent)}" if parent else None
    return out
