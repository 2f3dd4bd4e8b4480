"""Noise assets — our own small, hand-written equivalents of the
reference's data files (nicknames.csv, fake_names.py, qwerty_errors.yaml,
ocr_errors.csv, phonetic_variations.csv — see SURVEY.md §2.C).

These are *behavioral* stand-ins built from public knowledge (common US
names, QWERTY layout, classic OCR confusions, English phonetic
variants); the reference's distributional tests don't require its exact
asset contents, only the operator semantics. All assets are tiny and
are shipped to executors inside pandas-UDF closures / array literals
(broadcast-by-closure), never joined at scale.
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

# first name -> nicknames (reference analogue: data/nicknames.csv — 1,080
# names; ours is a compact, hand-curated public subset)
NICKNAMES: "dict[str, tuple[str, ...]]" = {
    "James": ("Jim", "Jimmy", "Jamie"),
    "Robert": ("Bob", "Bobby", "Rob", "Robbie", "Bert"),
    "John": ("Jack", "Johnny", "Jon"),
    "Michael": ("Mike", "Mikey", "Mick"),
    "William": ("Will", "Bill", "Billy", "Willy", "Liam"),
    "David": ("Dave", "Davey"),
    "Richard": ("Rick", "Dick", "Richie", "Ricky"),
    "Joseph": ("Joe", "Joey"),
    "Thomas": ("Tom", "Tommy"),
    "Christopher": ("Chris", "Topher", "Kit"),
    "Charles": ("Charlie", "Chuck", "Chas"),
    "Daniel": ("Dan", "Danny"),
    "Matthew": ("Matt", "Matty"),
    "Anthony": ("Tony", "Ant"),
    "Donald": ("Don", "Donny"),
    "Steven": ("Steve", "Stevie"),
    "Andrew": ("Andy", "Drew"),
    "Kenneth": ("Ken", "Kenny"),
    "Joshua": ("Josh",),
    "Kevin": ("Kev",),
    "Timothy": ("Tim", "Timmy"),
    "Ronald": ("Ron", "Ronnie"),
    "Jason": ("Jay", "Jase"),
    "Edward": ("Ed", "Eddie", "Ted", "Ned"),
    "Jeffrey": ("Jeff",),
    "Jacob": ("Jake",),
    "Nicholas": ("Nick", "Nicky"),
    "Jonathan": ("Jon", "Jonny"),
    "Stephen": ("Steve", "Stevie"),
    "Lawrence": ("Larry",),
    "Justin": ("Jus",),
    "Benjamin": ("Ben", "Benny", "Benji"),
    "Samuel": ("Sam", "Sammy"),
    "Gregory": ("Greg",),
    "Alexander": ("Alex", "Al", "Xander", "Sasha"),
    "Patrick": ("Pat", "Paddy"),
    "Raymond": ("Ray",),
    "Dennis": ("Denny",),
    "Gerald": ("Gerry", "Jerry"),
    "Douglas": ("Doug",),
    "Henry": ("Hank", "Harry"),
    "Peter": ("Pete",),
    "Zachary": ("Zach", "Zack"),
    "Walter": ("Walt", "Wally"),
    "Harold": ("Harry", "Hal"),
    "Arthur": ("Art", "Artie"),
    "Albert": ("Al", "Bert"),
    "Eugene": ("Gene",),
    "Russell": ("Russ", "Rusty"),
    "Philip": ("Phil",),
    "Bradley": ("Brad",),
    "Vincent": ("Vince", "Vinny"),
    "Mary": ("Molly", "Polly", "Mae"),
    "Patricia": ("Pat", "Patty", "Trish", "Tricia"),
    "Jennifer": ("Jen", "Jenny"),
    "Elizabeth": ("Liz", "Beth", "Betsy", "Eliza", "Libby", "Lizzie"),
    "Barbara": ("Barb", "Babs"),
    "Susan": ("Sue", "Susie", "Suzy"),
    "Jessica": ("Jess", "Jessie"),
    "Sarah": ("Sally",),
    "Karen": ("Kay",),
    "Nancy": ("Nan",),
    "Margaret": ("Maggie", "Meg", "Peggy", "Marge", "Daisy"),
    "Kimberly": ("Kim", "Kimmy"),
    "Deborah": ("Deb", "Debbie"),
    "Stephanie": ("Steph", "Stephie"),
    "Rebecca": ("Becky", "Becca"),
    "Sharon": ("Shari",),
    "Cynthia": ("Cindy",),
    "Kathleen": ("Kathy", "Kate", "Katie"),
    "Amanda": ("Mandy", "Amy"),
    "Melissa": ("Mel", "Missy"),
    "Dorothy": ("Dot", "Dottie", "Dora"),
    "Katherine": ("Kate", "Katie", "Kathy", "Kitty"),
    "Christine": ("Chris", "Chrissy", "Tina"),
    "Debra": ("Deb", "Debbie"),
    "Pamela": ("Pam",),
    "Virginia": ("Ginny", "Ginger"),
    "Judith": ("Judy", "Jude"),
    "Jacqueline": ("Jackie",),
    "Abigail": ("Abby", "Gail"),
    "Victoria": ("Vicky", "Tori"),
    "Samantha": ("Sam", "Sammy"),
    "Alexis": ("Lexi",),
    "Danielle": ("Dani",),
    "Isabella": ("Bella", "Izzy"),
    "Charlotte": ("Lottie", "Charlie"),
    "Gabriel": ("Gabe",),
    "Theresa": ("Terry", "Tess"),
    "Frances": ("Fran", "Frannie"),
    "Florence": ("Flo", "Flossie"),
    "Beverly": ("Bev",),
    "Natalie": ("Nat",),
    "Angela": ("Angie",),
    "Catherine": ("Cathy", "Cate", "Kitty"),
}

# fake names for use_fake_name (reference analogue: data/fake_names.py —
# NORC canonical fake/placeholder name lists)
FAKE_FIRST_NAMES = (
    "Girl", "Boy", "Baby", "Child", "Infant", "Son", "Daughter", "Minor",
    "Firstname", "First", "Unknown", "Unk", "None", "Noname", "Test", "Twin",
    "A", "B", "One", "Two", "Babyboy", "Babygirl", "Male", "Female",
)
FAKE_LAST_NAMES = (
    "Lastname", "Last", "Unknown", "Unk", "None", "Noname", "Test", "Doe",
    "Anonymous", "Anon", "Refused", "Declined", "Missing", "Sample", "Donotuse",
    "Household", "Resident", "Occupant", "Family", "Tenant",
)

# QWERTY adjacency for make_typos (reference analogue: data/qwerty_errors.yaml)
QWERTY_NEIGHBORS: "dict[str, str]" = {
    "1": "2q", "2": "13qw", "3": "24we", "4": "35er", "5": "46rt", "6": "57ty",
    "7": "68yu", "8": "79ui", "9": "80io", "0": "9op",
    "q": "12wa", "w": "23qeas", "e": "34wrsd", "r": "45etdf", "t": "56ryfg",
    "y": "67tugh", "u": "78yihj", "i": "89uojk", "o": "90ipkl", "p": "0ol",
    "a": "qwsz", "s": "weadzx", "d": "ersfxc", "f": "rtdgcv", "g": "tyfhvb",
    "h": "yugjbn", "j": "uihknm", "k": "iojlm", "l": "opk",
    "z": "asx", "x": "sdzc", "c": "dfxv", "v": "fgcb", "b": "ghvn",
    "n": "hjbm", "m": "jkn",
}

# OCR confusions for make_ocr_errors (reference analogue:
# data/ocr_errors.csv — 49 substitutions like 5→S, LI→U); token → variants
OCR_ERRORS: "dict[str, tuple[str, ...]]" = {
    "0": ("O", "D"), "1": ("I", "L"), "2": ("Z",), "5": ("S",), "6": ("G",),
    "8": ("B",), "9": ("g", "q"),
    "O": ("0", "D"), "D": ("O", "0"), "I": ("1", "l"), "l": ("1", "I"),
    "S": ("5",), "Z": ("2",), "B": ("8",), "G": ("6",), "g": ("9",), "q": ("9",),
    "m": ("rn",), "rn": ("m",), "w": ("vv",), "vv": ("w",), "d": ("cl",),
    "cl": ("d",), "nn": ("m",), "ri": ("n",), "LI": ("U",), "W": ("VV",),
    "E": ("F",), "F": ("E", "P"), "C": ("G", "O"), "K": ("R",), "R": ("K",),
    "u": ("ii", "v"), "v": ("u", "y"), "y": ("v",), "h": ("b", "li"),
    "b": ("h", "6"), "e": ("c", "o"), "c": ("e", "o"), "o": ("c", "e", "0"),
    "a": ("o", "ci"), "t": ("f", "+"), "f": ("t",), "s": ("5",), "i": ("j", "l"),
    "j": ("i",), "n": ("ri", "h"), "T": ("I",), "Y": ("V",), "V": ("Y", "U"),
    "U": ("V", "LI"),
}

# Phonetic variants for make_phonetic_errors (reference analogue:
# data/phonetic_variations.csv — 356 rules, '@' = deletion)
PHONETIC_VARIANTS: "dict[str, tuple[str, ...]]" = {
    "ph": ("f",), "f": ("ph",), "ck": ("k", "c"), "k": ("c", "ck"),
    "c": ("k", "s"), "sh": ("ch",), "ch": ("sh", "k"), "th": ("t",),
    "gh": ("", "g"), "kn": ("n",), "wr": ("r",), "mb": ("m",),
    "qu": ("kw", "q"), "x": ("ks", "z"), "z": ("s",), "s": ("z", "c"),
    "ee": ("ea", "ie", "y"), "ea": ("ee", "e"), "ie": ("ee", "y", "ei"),
    "ei": ("ie", "ay"), "oo": ("u", "ou"), "ou": ("oo", "ow"),
    "ow": ("ou", "o"), "ay": ("ai", "ey"), "ai": ("ay", "a"),
    "ey": ("ay", "y"), "y": ("i", "ie", "ey"), "i": ("y", "e"),
    "e": ("i", "a"), "a": ("e", "o"), "o": ("a", "u"), "u": ("o", "oo"),
    "ll": ("l",), "l": ("ll",), "tt": ("t",), "t": ("tt", "d"),
    "nn": ("n",), "n": ("nn",), "ss": ("s",), "mm": ("m",), "m": ("mm",),
    "rr": ("r",), "r": ("rr",), "dd": ("d",), "d": ("dd", "t"),
    "bb": ("b",), "pp": ("p",), "g": ("j",), "j": ("g",), "w": ("wh",),
    "wh": ("w",), "er": ("ar", "or"), "ar": ("er",), "or": ("er", "our"),
    "an": ("en",), "en": ("an", "in"), "in": ("en", "yn"), "on": ("an",),
}
