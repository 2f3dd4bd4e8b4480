"""Noise assets — full-fidelity data tables loaded from
``pseudopeople_spark/data/`` (built by ``tools/build_assets.py`` from
the reference's published data files: nicknames.csv 1,080 names,
phonetic_variations.csv 356 rules, ocr_errors.csv 49 confusions,
qwerty_errors.yaml adjacency, NORC fake-name lists, categorical option
lists — SURVEY.md §2.C). Round 1 shipped hand-written stand-ins ~10x
smaller; the noise DISTRIBUTIONS a user gets are defined by these
tables, so parity requires the real ones (VERDICT.md missing #1).

All assets are tiny and are shipped to executors inside pandas-UDF
closures / array literals (broadcast-by-closure), never joined at
scale. The synth name/street/city pools below are NOT noise assets —
they seed the deterministic population generator.
"""

from __future__ import annotations

FIRST_NAMES = (
    "James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael", "Linda",
    "David", "Elizabeth", "William", "Barbara", "Richard", "Susan", "Joseph", "Jessica",
    "Thomas", "Sarah", "Christopher", "Karen", "Charles", "Lisa", "Daniel", "Nancy",
    "Matthew", "Betty", "Anthony", "Sandra", "Mark", "Margaret", "Donald", "Ashley",
    "Steven", "Kimberly", "Andrew", "Emily", "Paul", "Donna", "Joshua", "Michelle",
    "Kenneth", "Carol", "Kevin", "Amanda", "Brian", "Melissa", "Timothy", "Deborah",
    "Ronald", "Stephanie", "George", "Rebecca", "Jason", "Sharon", "Edward", "Laura",
    "Jeffrey", "Cynthia", "Ryan", "Dorothy", "Jacob", "Amy", "Nicholas", "Kathleen",
    "Gary", "Angela", "Eric", "Shirley", "Jonathan", "Emma", "Stephen", "Brenda",
    "Larry", "Pamela", "Justin", "Nicole", "Scott", "Anna", "Brandon", "Samantha",
    "Benjamin", "Katherine", "Samuel", "Christine", "Gregory", "Debra", "Alexander", "Rachel",
    "Patrick", "Carolyn", "Frank", "Janet", "Raymond", "Maria", "Jack", "Olivia",
    "Dennis", "Heather", "Jerry", "Helen", "Tyler", "Catherine", "Aaron", "Diane",
    "Jose", "Julie", "Adam", "Victoria", "Nathan", "Joyce", "Henry", "Lauren",
    "Zachary", "Kelly", "Douglas", "Christina", "Peter", "Ruth", "Kyle", "Joan",
    "Noah", "Virginia", "Ethan", "Judith", "Jeremy", "Evelyn", "Walter", "Hannah",
    "Christian", "Andrea", "Keith", "Megan", "Roger", "Cheryl", "Terry", "Jacqueline",
    "Austin", "Madison", "Sean", "Teresa", "Gerald", "Abigail", "Carl", "Sophia",
    "Harold", "Martha", "Dylan", "Sara", "Arthur", "Gloria", "Lawrence", "Janice",
    "Jordan", "Kathryn", "Jesse", "Ann", "Bryan", "Isabella", "Billy", "Judy",
    "Bruce", "Charlotte", "Gabriel", "Julia", "Joe", "Grace", "Logan", "Amber",
    "Alan", "Alice", "Juan", "Jean", "Albert", "Denise", "Willie", "Frances",
    "Elijah", "Danielle", "Wayne", "Marilyn", "Randy", "Natalie", "Vincent", "Beverly",
    "Mason", "Diana", "Roy", "Brittany", "Ralph", "Theresa", "Bobby", "Kayla",
    "Russell", "Alexis", "Bradley", "Doris", "Philip", "Lori", "Eugene", "Tiffany",
)

LAST_NAMES = (
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller", "Davis",
    "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez", "Wilson", "Anderson", "Thomas",
    "Taylor", "Moore", "Jackson", "Martin", "Lee", "Perez", "Thompson", "White",
    "Harris", "Sanchez", "Clark", "Ramirez", "Lewis", "Robinson", "Walker", "Young",
    "Allen", "King", "Wright", "Scott", "Torres", "Nguyen", "Hill", "Flores",
    "Green", "Adams", "Nelson", "Baker", "Hall", "Rivera", "Campbell", "Mitchell",
    "Carter", "Roberts", "Gomez", "Phillips", "Evans", "Turner", "Diaz", "Parker",
    "Cruz", "Edwards", "Collins", "Reyes", "Stewart", "Morris", "Morales", "Murphy",
    "Cook", "Rogers", "Gutierrez", "Ortiz", "Morgan", "Cooper", "Peterson", "Bailey",
    "Reed", "Kelly", "Howard", "Ramos", "Kim", "Cox", "Ward", "Richardson",
    "Watson", "Brooks", "Chavez", "Wood", "James", "Bennett", "Gray", "Mendoza",
    "Ruiz", "Hughes", "Price", "Alvarez", "Castillo", "Sanders", "Patel", "Myers",
    "Long", "Ross", "Foster", "Jimenez", "Powell", "Jenkins", "Perry", "Russell",
    "Sullivan", "Bell", "Coleman", "Butler", "Henderson", "Barnes", "Gonzales", "Fisher",
    "Vasquez", "Simmons", "Romero", "Jordan", "Patterson", "Alexander", "Hamilton", "Graham",
    "Reynolds", "Griffin", "Wallace", "Moreno", "West", "Cole", "Hayes", "Bryant",
)

STREET_NAMES = (
    "Main", "Oak", "Pine", "Maple", "Cedar", "Elm", "Washington", "Lake", "Hill",
    "Walnut", "Spring", "North", "Ridge", "Church", "Willow", "Mill", "Sunset",
    "Railroad", "Jackson", "Cherry", "Highland", "Johnson", "Dogwood", "Chestnut",
    "Spruce", "Wilson", "Meadow", "Forest", "River", "Center", "Franklin", "Park",
)

CITIES = (
    "Springfield", "Franklin", "Clinton", "Greenville", "Bristol", "Fairview",
    "Salem", "Madison", "Georgetown", "Arlington", "Ashland", "Dover", "Oxford",
    "Jackson", "Burlington", "Manchester", "Milton", "Newport", "Auburn", "Dayton",
    "Lexington", "Milford", "Riverside", "Cleveland", "Dayton2", "Hudson",
    "Kingston", "Mount Vernon", "Oakland", "Winchester", "Centerville", "Lebanon",
)


# ---------------------------------------------------------------------------
# full-fidelity noise asset tables (see module docstring)
# ---------------------------------------------------------------------------

import csv as _csv


def _read_asset(fname: str) -> "list[str]":
    """Read a data CSV through ``importlib.resources`` so the package
    works BOTH from a source checkout and from the ``--py-files`` zip
    spark-submit ships to executors (zipimport has no real filesystem
    paths — a plain ``open(os.path.join(__file__, ...))`` breaks the
    cluster launch path, tools/submit.sh)."""
    from importlib import resources

    text = (resources.files("pseudopeople_spark") / "data" / fname).read_text()
    return [r for r in text.splitlines() if r and not r.startswith("#")]


def _load_rules(fname: str) -> "dict[str, tuple[str, ...]]":
    """token -> ordered variant tuple, from one-row-per-(token,variant)
    CSVs (row order = draw-CDF order). The old '|'-joined single-row
    format corrupted rules whose variant IS '|' (an OCR confusion
    character) into deletions."""
    out: "dict[str, list[str]]" = {}
    for rec in _csv.DictReader(_read_asset(fname)):
        out.setdefault(rec["token"], []).append(rec["variant"])
    return {k: tuple(v) for k, v in out.items()}


def _load_pairs(fname: str) -> "list[tuple[str, str]]":
    recs = list(_csv.DictReader(_read_asset(fname)))
    keys = list(recs[0].keys())
    return [(r[keys[0]], r[keys[1]]) for r in recs]


# first name -> nicknames (title-cased at build time, like the
# reference's loader noise_scaling.py:54-59)
NICKNAMES: "dict[str, tuple[str, ...]]" = _load_rules("nicknames.csv")

# NORC PVS fake/placeholder names (reference data/fake_names.py)
FAKE_FIRST_NAMES: "tuple[str, ...]" = tuple(n for k, n in _load_pairs("fake_names.csv") if k == "first")
FAKE_LAST_NAMES: "tuple[str, ...]" = tuple(n for k, n in _load_pairs("fake_names.csv") if k == "last")

# QWERTY adjacency for make_typos (reference data/qwerty_errors.yaml);
# value = string of neighbor characters (kernel indexes into it)
QWERTY_NEIGHBORS: "dict[str, str]" = {
    k: "".join(v) for k, v in _load_rules("qwerty_neighbors.csv").items()
}

# OCR confusions for make_ocr_errors (reference data/ocr_errors.csv);
# token -> variants, longest-match tokens like "cl" included
OCR_ERRORS: "dict[str, tuple[str, ...]]" = _load_rules("ocr_rules.csv")

# Phonetic variants for make_phonetic_errors (reference
# data/phonetic_variations.csv, ANU 2008; "" = deletion)
PHONETIC_VARIANTS: "dict[str, tuple[str, ...]]" = _load_rules("phonetic_rules.csv")

# categorical option lists per column (reference
# data/incorrect_select_options.csv) — the choose_wrong_option universe
SELECT_OPTIONS: "dict[str, tuple[str, ...]]" = {}
for _col, _opt in _load_pairs("select_options.csv"):
    SELECT_OPTIONS.setdefault(_col, ())
    SELECT_OPTIONS[_col] = SELECT_OPTIONS[_col] + (_opt,)


def select_options_for(column: str) -> "tuple[str, ...] | None":
    """Draw universe for ``choose_wrong_option`` on ``column`` — the
    single source of truth is the asset table above (reference CSV
    order; the order defines the vectorized_choice CDF indexing).
    Prefixed address columns (``mailing_address_state``) resolve to
    their base key."""
    opts = SELECT_OPTIONS.get(column)
    if opts:
        return opts
    for key, vals in SELECT_OPTIONS.items():
        if column.endswith("_" + key):
            return vals
    return None
