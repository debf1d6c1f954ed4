"""Technical-specification parsers and matchers.

Semantics ported from the reference's technical matchers
(src/ontology_extension_manager.py:517-650): frequency-range overlap,
impedance/voltage tolerance comparison, connector and mounting synonym tables.
Used both as linking features (J3) and as property extractors (M15/M22).
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

_NUM = re.compile(r"[\d.]+")


def extract_freq_range(freq_str: str):
    """'2.4-5.8 GHz' -> (2400.0, 5800.0) in MHz; None if unparseable."""
    s = freq_str.lower().replace(" ", "")
    if "ghz" in s:
        mult = 1000.0
    elif "mhz" in s:
        mult = 1.0
    else:
        return None
    nums = _NUM.findall(s)
    nums = [n for n in nums if n.strip(".")]
    if not nums:
        return None
    try:
        vals = [float(n) * mult for n in nums]
    except ValueError:
        return None
    if len(vals) == 1:
        return (vals[0], vals[0])
    return (min(vals), max(vals))


def match_frequency(freq1: str, freq2: str) -> float:
    r1, r2 = extract_freq_range(freq1), extract_freq_range(freq2)
    if not r1 or not r2:
        return 0.0
    lo, hi = max(r1[0], r2[0]), min(r1[1], r2[1])
    if lo <= hi:
        total = max(r1[1], r2[1]) - min(r1[0], r2[0])
        return (hi - lo) / total if total > 0 else 1.0
    return 0.0


def _first_number(s: str):
    nums = [n for n in _NUM.findall(s.lower()) if n.strip(".")]
    try:
        return float(nums[0]) if nums else None
    except ValueError:
        return None


def match_impedance(imp1: str, imp2: str) -> float:
    v1, v2 = _first_number(imp1), _first_number(imp2)
    if v1 is None or v2 is None:
        return 0.0
    if v1 == v2:
        return 1.0
    if abs(v1 - v2) / max(v1, v2) <= 0.1:
        return 0.9
    return 0.0


def match_voltage(volt1: str, volt2: str) -> float:
    v1, v2 = _first_number(volt1), _first_number(volt2)
    if v1 is None or v2 is None:
        return 0.0
    if v1 == v2:
        return 1.0
    if abs(v1 - v2) / max(v1, v2) <= 0.1:
        return 0.8
    return 0.0


CONNECTOR_SYNONYMS = {
    "sma": ["sma", "sub miniature a"],
    "bnc": ["bnc", "bayonet neill-concelman"],
    "n-type": ["n-type", "n connector", "type n"],
    "mmcx": ["mmcx", "micro-miniature coaxial"],
}

MOUNTING_SYNONYMS = {
    "surface_mount": ["smd", "smt", "surface mount", "surface-mount"],
    "through_hole": ["through hole", "through-hole", "tht", "thru-hole"],
    "panel_mount": ["panel mount", "panel-mount", "chassis mount"],
}


def _match_with_synonyms(a: str, b: str, table: dict) -> float:
    a, b = a.lower().strip(), b.lower().strip()
    if a == b:
        return 1.0
    for variants in table.values():
        if a in variants and b in variants:
            return 1.0
    return SequenceMatcher(None, a, b).ratio()


def match_connector(a: str, b: str) -> float:
    return _match_with_synonyms(a, b, CONNECTOR_SYNONYMS)


def match_mounting(a: str, b: str) -> float:
    return _match_with_synonyms(a, b, MOUNTING_SYNONYMS)


TECHNICAL_MATCHERS = {
    "frequency": match_frequency,
    "impedance": match_impedance,
    "voltage": match_voltage,
    "connector": match_connector,
    "mounting": match_mounting,
}
