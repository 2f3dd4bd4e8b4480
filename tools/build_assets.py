"""One-time converter: reference noise-asset data tables -> this repo's
``pseudopeople_spark/data/`` files.

These are DATA tables (not code): published nickname lists, the ANU
phonetic-variation rules (Agus Pudjijono, ANU 2008), classic OCR
confusion pairs, QWERTY adjacency, NORC PVS fake/placeholder names and
the categorical option lists — the noise *distributions* a pseudopeople
user gets are defined by these tables, so distributional parity
requires the same tables (VERDICT.md "What's missing" #1). Formats are
normalized to a compact (key, pipe-separated-variants) CSV the Spark
engine loads directly; transformations applied at build time mirror the
reference loaders (title-casing nicknames, '@'->deletion in phonetic
rules, group-by-original for OCR).

Run from the repo root:  python tools/build_assets.py
"""

from __future__ import annotations

import csv
import os
import re

REF = "/root/reference/src/pseudopeople/data"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "pseudopeople_spark", "data")


def write_rules(path: str, header: str, rows: "list[tuple[str, list[str]]]") -> None:
    # ONE ROW PER (token, variant): '|' is itself an OCR variant
    # character, so any join-delimiter encoding corrupts rules whose
    # variant IS the delimiter (the old '|'-joined format turned the
    # reference's '1'->'|' confusion into a deletion). Variant order is
    # row order — it defines the draw CDF indexing.
    with open(path, "w") as f:
        f.write(header)
        w = csv.writer(f)
        w.writerow(["token", "variant"])
        n = 0
        for token, variants in rows:
            for v in variants:
                w.writerow([token, v])
                n += 1
    print(f"wrote {path} ({n} rows)")


def nicknames() -> None:
    rows = []
    with open(f"{REF}/nicknames.csv") as f:
        for rec in csv.DictReader(f):
            name = rec["name"].strip().title()
            nicks = [v.strip().title() for k, v in rec.items() if k != "name" and v and v.strip()]
            if name and nicks:
                rows.append((name, nicks))
    write_rules(
        os.path.join(OUT, "nicknames.csv"),
        "# Nickname table (title-cased), from pseudopeople data/nicknames.csv\n"
        "# (public nickname list shipped by the reference; loader semantics\n"
        "#  mirror its noise_scaling.py:54-59).\n",
        rows,
    )


def phonetic() -> None:
    groups: "dict[str, list[str]]" = {}
    with open(f"{REF}/phonetic_variations.csv") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(",")
            orig, new = parts[1], parts[2].replace("@", "")
            groups.setdefault(orig, []).append(new)
    write_rules(
        os.path.join(OUT, "phonetic_rules.csv"),
        "# Phonetic variation rules (token -> variants, '' = deletion), from\n"
        "# pseudopeople data/phonetic_variations.csv (Agus Pudjijono, ANU 2008).\n"
        "# The reference ignores the positional column (utilities.py:308-326);\n"
        "# grouped by original token the same way.\n",
        list(groups.items()),
    )


def ocr() -> None:
    groups: "dict[str, list[str]]" = {}
    with open(f"{REF}/ocr_errors.csv") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            true, err = line.split(",")[:2]
            groups.setdefault(true, []).append(err)
    write_rules(
        os.path.join(OUT, "ocr_rules.csv"),
        "# OCR confusion rules (token -> variants), from pseudopeople\n"
        "# data/ocr_errors.csv (classic OCR substitution pairs).\n",
        list(groups.items()),
    )


def qwerty() -> None:
    # the reference ships YAML; parse its simple `key:\n- v` shape directly
    # so the build does not depend on a YAML library
    neighbors: "dict[str, list[str]]" = {}
    key = None
    with open(f"{REF}/qwerty_errors.yaml") as f:
        for raw in f:
            line = raw.rstrip("\n")
            if not line.strip() or line.strip().startswith("#"):
                continue
            m = re.match(r"^(['\"]?)(.+?)\1:\s*$", line.strip())
            if m and not line.startswith("-"):
                key = m.group(2)
                neighbors[key] = []
            elif line.strip().startswith("-") and key is not None:
                v = line.strip()[1:].strip().strip("'\"")
                neighbors[key].append(v)
    write_rules(
        os.path.join(OUT, "qwerty_neighbors.csv"),
        "# QWERTY adjacency (char -> neighbor chars), from pseudopeople\n"
        "# data/qwerty_errors.yaml (keyboard layout geometry).\n",
        list(neighbors.items()),
    )


def fake_names() -> None:
    ns: "dict[str, list[str]]" = {"first": [], "last": []}
    src = open(f"{REF}/fake_names.py").read()
    for kind, var in (("first", "fake_first_names"), ("last", "fake_last_names")):
        m = re.search(rf"{var}\s*=\s*\[(.*?)\]", src, re.S)
        ns[kind] = re.findall(r'"([^"]+)"', m.group(1))
    path = os.path.join(OUT, "fake_names.csv")
    with open(path, "w") as f:
        f.write(
            "# NORC PVS fake/placeholder name lists, from pseudopeople\n"
            "# data/fake_names.py (published NORC report values).\n"
        )
        w = csv.writer(f)
        w.writerow(["kind", "name"])
        for kind, names in ns.items():
            for n in names:
                w.writerow([kind, n])
    print(f"wrote {path} ({sum(len(v) for v in ns.values())} rows)")


def select_options() -> None:
    cols: "dict[str, list[str]]" = {}
    with open(f"{REF}/incorrect_select_options.csv") as f:
        for rec in csv.DictReader(f):
            for k, v in rec.items():
                if v and v.strip():
                    cols.setdefault(k, []).append(v.strip())
    path = os.path.join(OUT, "select_options.csv")
    with open(path, "w") as f:
        f.write(
            "# Categorical option lists per column, from pseudopeople\n"
            "# data/incorrect_select_options.csv (the choose_wrong_option\n"
            "# draw universe, noise_scaling.py:80-82).\n"
        )
        w = csv.writer(f)
        w.writerow(["column", "option"])
        for col, opts in cols.items():
            for o in opts:
                w.writerow([col, o])
    print(f"wrote {path} ({sum(len(v) for v in cols.values())} rows)")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    nicknames()
    phonetic()
    ocr()
    qwerty()
    fake_names()
    select_options()
