"""Export formatters and sinks.

* ``schema_org_object`` — the reference's deterministic JSON-LD fallback
  generator (src/schema_org_extractor.py:137-171): ``{@context, @type:
  'Product', name, description[:200], category}`` plus a productontology.org
  ``additionalType`` URI from the 14-entry component→wikipedia mapping with
  partial matching, else ``name.replace(' ', '_')`` (M13).
* ``enhance_schema_object`` — property merge with the ``elec:`` namespace
  promotion and scalar→list promotion on conflict
  (src/schema_org_relation_extractor.py:226-280, M14).
* ``sanitize_filename`` — Windows-safe export names
  (src/schema_org_pipeline.py:127-138, M18).
* ``sanitize_owl_name`` — OWL identifier sanitizer
  (src/evaluation/consistency.py:56-58,71-73, M19).
* ``infer_category`` — keyword category heuristic
  (src/supervisor_demo_pipeline.py:321-332, M12).
* ``write_graph_outputs`` — partitioned Parquet node/edge sinks plus a
  driver-side JSON summary (replaces S3/S4 JSON writers).
"""

from __future__ import annotations

import json
import os
import re

# Component -> Wikipedia resource mapping for productontology URIs
# (reference src/schema_org_extractor.py:140-155 semantics).
PRODUCT_ONTOLOGY_MAP = {
    "antenna": "Antenna_(radio)",
    "capacitor": "Capacitor",
    "resistor": "Resistor",
    "inductor": "Inductor",
    "diode": "Diode",
    "transistor": "Transistor",
    "connector": "Electrical_connector",
    "cable": "Cable",
    "sensor": "Sensor",
    "filter": "Electronic_filter",
    "oscillator": "Electronic_oscillator",
    "amplifier": "Amplifier",
    "switch": "Switch",
    "relay": "Relay",
}


def product_ontology_uri(concept: str) -> str:
    c = concept.lower()
    for key, wiki in PRODUCT_ONTOLOGY_MAP.items():
        if key in c:
            return f"http://www.productontology.org/id/{wiki}"
    return f"http://www.productontology.org/id/{concept.replace(' ', '_')}"


def infer_category(concept: str) -> str:
    """Keyword category heuristic (reference supervisor_demo_pipeline.py:321-332)."""
    c = concept.lower()
    if any(k in c for k in ("capacitor", "resistor", "inductor")):
        return "Passive Components"
    if any(k in c for k in ("transistor", "diode", "ic", "amplifier", "circuit")):
        return "Active Components"
    if any(k in c for k in ("connector", "cable", "socket")):
        return "Interconnects"
    return "General Electronics"


def schema_org_object(name: str, description: str = "", category: str = "") -> dict:
    """Deterministic JSON-LD fallback object (reference M13 fallback path)."""
    return {
        "@context": "https://schema.org",
        "@type": "Product",
        "name": name,
        "description": (description or f"Electronic component: {name}")[:200],
        "category": category or infer_category(name),
        "additionalType": product_ontology_uri(name),
    }


ELEC_PROPS = ("frequency", "impedance", "voltage", "power", "gain", "connector",
              "mounting", "temperature", "protocol", "standard")
RELATION_KEYS = ("isRelatedTo", "hasPart", "isPartOf", "worksWith", "requires",
                 "manufacturer", "connectedTo")


def enhance_schema_object(base: dict, properties: dict | None = None,
                          relations: list[dict] | None = None) -> dict:
    """Merge extracted properties/relations into a JSON-LD object (M14):
    ``elec:*`` props promote @context to a dict with the elec namespace;
    relation keys append with scalar→list promotion on conflict."""
    obj = dict(base)
    has_elec = False
    for prop, value in (properties or {}).items():
        if prop in ELEC_PROPS:
            obj[f"elec:{prop}"] = value
            has_elec = True
        else:
            obj[prop] = value
    if has_elec and not isinstance(obj.get("@context"), dict):
        obj["@context"] = {"@vocab": "https://schema.org/",
                           "elec": "https://w3id.org/elec#"}
    for rel in relations or []:
        key = rel.get("relation")
        target = rel.get("target")
        if not key or not target:
            continue
        if key in obj:
            cur = obj[key]
            if not isinstance(cur, list):
                obj[key] = [cur]
            if target not in obj[key]:
                obj[key].append(target)
        else:
            obj[key] = target
    return obj


_FNAME_BAD = re.compile(r'[<>:"/\\|?*\x00-\x1f]')
_FNAME_US = re.compile(r"_+")


def sanitize_filename(name: str, max_len: int = 80) -> str:
    """Windows-safe export file name (reference M18)."""
    s = _FNAME_BAD.sub("_", name)
    s = _FNAME_US.sub("_", s).strip("_")
    return s[:max_len]


_OWL_BAD = re.compile(r"[^a-zA-Z0-9_]")


def sanitize_owl_name(name: str) -> str:
    """OWL identifier sanitizer (reference M19): non-alnum→_, digit-prefix→_."""
    s = _OWL_BAD.sub("_", name)
    if s and s[0].isdigit():
        s = "_" + s
    return s


def entities_to_jsonld(entities_rows: list[dict], props: dict | None = None) -> list[dict]:
    """Learned tasks -> JSON-LD @graph objects (deterministic fallback path)."""
    from ontoray.linking import EXTEND, UNCERTAIN
    out = []
    for e in entities_rows:
        if e.get("decision") not in (EXTEND, UNCERTAIN):
            continue
        base = schema_org_object(e["name"])
        obj = enhance_schema_object(base, (props or {}).get(e["name"]))
        if e.get("parent_class"):
            obj["subClassOf"] = e["parent_class"]
        if e.get("status") == "review":
            obj["reviewStatus"] = "NeedsReview"
        out.append(obj)
    return out


def write_graph_outputs(result, out_dir: str, summary_extra: dict | None = None) -> dict:
    """Partitioned Parquet sinks for every output table + one JSON summary
    (replaces the reference's per-run JSON report writers S3/S4)."""
    os.makedirs(out_dir, exist_ok=True)
    for name in ("entities", "nodes", "edges", "triples_dedup"):
        ds = getattr(result, name)
        ds.write_parquet(os.path.join(out_dir, name))
    summary = dict(result.stats)
    if summary_extra:
        summary.update(summary_extra)
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=str)
    return summary
