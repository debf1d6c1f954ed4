"""Schema.org JSON-LD validation (reference src/schema_org_validator.py:39-239).

Mirrors the reference's checks — required properties per @type, @context
validity, recommended properties, additionalType URI shape, empty values,
undefined namespace prefixes — as pure functions plus a Ray ``map_batches``
wrapper that validates the exported JSON-LD column distributed and reduces to
the reference's report shape (total/valid/errors/warnings/recommendations/
validation_rate)."""

from __future__ import annotations

import json
from urllib.parse import urlparse

import pyarrow as pa

REQUIRED_PROPERTIES = {
    "Product": ["@context", "@type", "name"],
    "Organization": ["@context", "@type", "name"],
}
_DEFAULT_REQUIRED = ["@context", "@type", "name"]

RECOMMENDED_PROPERTIES = {
    "Product": ["description", "category", "manufacturer"],
    "Organization": ["description"],
}

_SCHEMA_ORG = ("https://schema.org/", "http://schema.org/")


def _valid_context(context) -> bool:
    if isinstance(context, str):
        return context in _SCHEMA_ORG
    if isinstance(context, dict):
        return context.get("@vocab", "") in _SCHEMA_ORG
    return False


def _valid_uri(uri) -> bool:
    try:
        r = urlparse(str(uri))
        return bool(r.scheme) and bool(r.netloc)
    except Exception:
        return False


def validate_object(obj: dict, object_id: str = "") -> dict:
    """Single-object validation: {valid, errors, warnings, recommendations}."""
    oid = object_id or f"Object ({obj.get('name', 'Unknown')})"
    errors: list[str] = []
    warnings: list[str] = []
    recommendations: list[str] = []

    schema_type = obj.get("@type", "Unknown")
    for prop in REQUIRED_PROPERTIES.get(schema_type, _DEFAULT_REQUIRED):
        if prop not in obj or not obj[prop]:
            errors.append(f"{oid}: Missing required property '{prop}'")

    if "@context" in obj and not _valid_context(obj["@context"]):
        warnings.append(f"{oid}: Invalid or non-standard @context")

    missing_rec = [p for p in RECOMMENDED_PROPERTIES.get(schema_type, [])
                   if p not in obj or not obj[p]]
    if missing_rec:
        recommendations.append(
            f"{oid}: Consider adding properties: {', '.join(missing_rec)}")

    if "additionalType" in obj and not _valid_uri(obj["additionalType"]):
        warnings.append(f"{oid}: additionalType URI may be invalid: "
                        f"{obj['additionalType']}")

    empty = [k for k, v in obj.items() if v == "" or v is None]
    if empty:
        warnings.append(f"{oid}: Empty values found in properties: "
                        f"{', '.join(empty)}")

    context = obj.get("@context", {})
    namespaces = ({k for k in context if not k.startswith("@")}
                  if isinstance(context, dict) else set())
    for key in obj:
        if ":" in key and not key.startswith("@"):
            ns = key.split(":")[0]
            if ns not in namespaces:
                warnings.append(f"{oid}: Property '{key}' uses undefined "
                                f"namespace '{ns}'")

    return {"valid": not errors, "errors": errors, "warnings": warnings,
            "recommendations": recommendations}


def validate_objects(objs: list[dict]) -> dict:
    """Reference-shaped report over a list of JSON-LD objects."""
    report = {"total_objects": len(objs), "valid_objects": 0,
              "errors": [], "warnings": [], "recommendations": []}
    for i, obj in enumerate(objs):
        r = validate_object(obj, f"Object {i} ({obj.get('name', 'Unknown')})")
        report["valid_objects"] += int(r["valid"])
        report["errors"] += r["errors"]
        report["warnings"] += r["warnings"]
        report["recommendations"] += r["recommendations"]
    report["validation_rate"] = (report["valid_objects"] / report["total_objects"] * 100
                                 if report["total_objects"] else 0.0)
    return report


def validate_batch(batch: pa.Table, jsonld_col: str = "jsonld") -> pa.Table:
    """(…, jsonld) rows -> per-object validation rows (distributed stage)."""
    names, valid, n_err, n_warn, n_rec = [], [], [], [], []
    for s in batch.column(jsonld_col).to_pylist():
        obj = json.loads(s)
        r = validate_object(obj)
        names.append(obj.get("name", ""))
        valid.append(r["valid"])
        n_err.append(len(r["errors"]))
        n_warn.append(len(r["warnings"]))
        n_rec.append(len(r["recommendations"]))
    return pa.table({
        "name": pa.array(names, pa.string()),
        "valid": pa.array(valid, pa.bool_()),
        "n_errors": pa.array(n_err, pa.int64()),
        "n_warnings": pa.array(n_warn, pa.int64()),
        "n_recommendations": pa.array(n_rec, pa.int64()),
    })


def validate_jsonld_ds(jsonld_ds, jsonld_col: str = "jsonld"):
    """Distributed validation over an exported JSON-LD Dataset."""
    return jsonld_ds.map_batches(validate_batch, batch_format="pyarrow",
                                 fn_kwargs={"jsonld_col": jsonld_col})


def validation_report(validated_ds) -> dict:
    """Reduce per-object rows to the summary report (counts only — the full
    message lists stay distributed)."""
    from ray.data.aggregate import Count, Sum
    agg = validated_ds.map_batches(
        lambda b: pa.table({
            "valid_i": pa.compute.cast(b.column("valid"), pa.int64()),
            "n_errors": b.column("n_errors"),
            "n_warnings": b.column("n_warnings"),
            "n_recommendations": b.column("n_recommendations"),
        }), batch_format="pyarrow").aggregate(
        Count(alias_name="total_objects"),
        Sum("valid_i", alias_name="valid_objects"),
        Sum("n_errors", alias_name="n_errors"),
        Sum("n_warnings", alias_name="n_warnings"),
        Sum("n_recommendations", alias_name="n_recommendations"))
    total = agg["total_objects"] or 0
    valid = agg["valid_objects"] or 0
    agg["validation_rate"] = (valid / total * 100) if total else 0.0
    return agg
