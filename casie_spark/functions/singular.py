"""F12: plural-noun singularization (SURVEY §2.7).

The reference calls ``inflect.engine().singular_noun``
(parseJsontoFeatures.py:34,967,1254); that package is not available
here, so this is a compact reimplementation of its contract from the
published English pluralization rules: returns the singular form for a
plural noun, ``False`` when the word is not plural (exactly the
sentinel the reference's caller relies on).  Irregulars and -es/-ies
ambiguities are resolved with small exception tables; the long tail of
Latin/Greek plurals inflect knows is out of scope (documented
divergence — the CASIE noun classes are everyday English).
"""

from __future__ import annotations

_IRREGULAR = {
    "people": "person", "men": "man", "women": "woman",
    "children": "child", "teeth": "tooth", "feet": "foot",
    "mice": "mouse", "geese": "goose", "criteria": "criterion",
    "phenomena": "phenomenon", "analyses": "analysis",
    "crises": "crisis", "theses": "thesis", "bases": "basis",
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "appendices": "appendix", "media": "medium", "data": "datum",
}

# -ves plurals whose singular ends -f / -fe
_VES = {
    "knives": "knife", "lives": "life", "wives": "wife",
    "thieves": "thief", "wolves": "wolf", "shelves": "shelf",
    "leaves": "leaf", "halves": "half", "selves": "self",
    "calves": "calf", "loaves": "loaf", "scarves": "scarf",
}

# -ses plurals formed from an -s/-us singular (virus+es), as opposed to
# an -se singular + s (database+s)
_SES_ES = {
    "viruses": "virus", "statuses": "status", "bonuses": "bonus",
    "campuses": "campus", "censuses": "census", "buses": "bus",
    "aliases": "alias", "atlases": "atlas", "gases": "gas",
    "lenses": "lens", "surpluses": "surplus", "walruses": "walrus",
}

# -ies plurals whose singular ends -ie, not -y
_IES_IE = {
    "movies": "movie", "cookies": "cookie", "zombies": "zombie",
    "rookies": "rookie", "calories": "calorie", "ties": "tie",
    "lies": "lie", "pies": "pie", "dies": "die", "selfies": "selfie",
    "goalies": "goalie", "sorties": "sortie", "genies": "genie",
}

_NON_PLURAL_S = ("ss", "us", "is", "'s")


def singular_noun(word: str) -> str | bool:
    """Singular form of a plural noun; False if ``word`` is not plural
    (inflect.singular_noun contract).  Case of the first letter is
    preserved for capitalized input."""
    if not word or len(word) < 2:
        return False
    low = word.lower()

    def _case(sing: str) -> str:
        if word[0].isupper():
            return sing[:1].upper() + sing[1:]
        return sing

    for table in (_IRREGULAR, _VES, _SES_ES, _IES_IE):
        if low in table:
            return _case(table[low])
    if not low.endswith("s"):
        return False
    if low.endswith(_NON_PLURAL_S):
        return False
    if low.endswith("ies") and len(low) > 4:
        return _case(low[:-3] + "y")
    if low.endswith(("sses", "xes", "zes", "ches", "shes")):
        return _case(low[:-2])
    if low.endswith("oes") and len(low) > 4:
        return _case(low[:-2])  # heroes, tomatoes, potatoes
    # remaining -es after -se singulars (databases; breaches was
    # handled above) and plain -s plurals: strip one s, preserving the
    # original casing throughout
    return word[:-1]
