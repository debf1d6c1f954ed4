"""ontoray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the data-processing semantics of the reference ontology-learning
pipeline (itssnehin/Ontology-Learning) as ray.data.Dataset pipelines:
deterministic text cleaning (byte-identical per url), chunking, mention and
triple extraction (Hearst hyponymy + SVO + technical-property patterns) in
actor pools, entity linking against a broadcast alias dictionary,
canonicalization as explicit groupby-aggregate shuffles, and a final
sort-materialized node/edge Parquet graph in place of Neo4j.
"""

__version__ = "0.1.0"
