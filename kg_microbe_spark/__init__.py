"""kg_microbe_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the semantics of Knowledge-Graph-Hub/kg-microbe,
rebuilt over Common-Crawl-style web pages.

Architecture (SURVEY.md §7): extract → lexicon → mentions → link → canon →
triples → merge, every stage a declarative DataFrame plan; Python appears
only inside Arrow-batched ``mapInPandas`` UDFs (text extraction, trie scan).
"""

__version__ = "0.1.0"
