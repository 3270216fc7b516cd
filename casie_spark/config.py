"""CASIE ontology constants.

These are the *data* of the CASIE annotation scheme (event subtypes,
argument entity types, legal event->argument pairs, argument->role
maps, trigger seed lexicons).  They define query semantics, so they are
reproduced from the reference verbatim as values:

- EVENT_SUBTYPES   <- TriggerList, reference code/link_coref.py:35
- ARGUMENT_TYPES   <- ArgumentList, link_coref.py:36-37
- PAIR             <- Pair, link_coref.py:38-42
- WORDSET          <- Wordset, link_coref.py:43-47
- GENERAL_NOUNS    <- GeneralN, link_coref.py:48-50
- GENERAL_ARG      <- GeneralArg, link_coref.py:57
- ROLE_PAIR        <- RolePair, link_coref.py:59-81
- COREF_WEIGHTS / COREF_THRESHOLD <- link_coref.py:2041-2042, :1670
- NER whitelist    <- selectedNER, parseJsontoFeatures.py:164-165
"""

from __future__ import annotations

EVENT_SUBTYPES = [
    "Phishing",
    "DiscoverVulnerability",
    "Databreach",
    "PatchVulnerability",
    "Ransom",
]

EVENT_SUPERTYPE = {
    "Phishing": "Attack",
    "Databreach": "Attack",
    "Ransom": "Attack",
    "DiscoverVulnerability": "Vulnerability-related",
    "PatchVulnerability": "Vulnerability-related",
}

ARGUMENT_TYPES = [
    "Patch", "Data", "Money", "Time", "Organization", "GPE", "File",
    "Version", "Person", "Vulnerability", "PaymentMethod", "CVE",
    "Device", "Website", "System", "Number", "PII", "Malware",
    "Capabilities", "Purpose", "Software",
]

# Legal argument entity types per event subtype (link_coref.py:38-42).
PAIR = {
    "Phishing": [
        "Capabilities", "File", "GPE", "Money", "Number", "Organization",
        "Person", "Website", "System", "PII", "Malware", "Purpose",
        "Time", "Data", "Software",
    ],
    "Ransom": [
        "Capabilities", "Money", "Time", "Organization", "GPE", "File",
        "Person", "PaymentMethod", "Device", "System", "Number",
        "Malware", "Website", "Software",
    ],
    "Databreach": [
        "Data", "Money", "Time", "Organization", "GPE", "File", "Person",
        "Device", "System", "Number", "Website", "PII", "Malware",
        "Capabilities", "Purpose", "Software",
    ],
    "DiscoverVulnerability": [
        "Time", "Organization", "Version", "Person", "Vulnerability",
        "CVE", "Device", "System", "Capabilities", "Website", "Software",
    ],
    "PatchVulnerability": [
        "Time", "Organization", "Version", "Person", "Vulnerability",
        "CVE", "Device", "System", "Capabilities", "Patch", "Website",
        "Software",
    ],
}

# Trigger seed lexicons for the rule/similarity tagger (link_coref.py:43-47).
WORDSET = {
    "DiscoverVulnerability": [
        "find", "publish", "identify", "demonstrate", "discover",
        "investigate", "observe", "uncover", "notice", "notify",
        "acknowledge", "exist", "report", "say", "exploit", "reside",
        "study", "reveal", "disclose", "expose", "declare", "introduce",
        "develop", "exposure", "explain", "describe", "vulnerable",
        "appear", "suggest", "indicate",
    ],
    "PatchVulnerability": [
        "install", "firmware", "reportedly", "note", "deploy", "reveal",
        "develop", "build", "address", "resolve", "announce", "release",
        "update", "bug", "fix", "issue", "improve", "distribute",
    ],
    "Databreach": [
        "eavesdrop", "intercept", "credential-harvesting", "leakage",
        "dump", "sold", "harvest", "corrupted", "copied", "collecting",
        "handed", "published", "grab", "steal", "privacy", "obtain",
        "pilfered", "collected", "sensitive", "circulated",
        "compromised", "allegedly", "unauthorized",
    ],
    "Ransom": [
        "asking", "demanding", "payment", "ransom", "bitcoin", "provide",
        "refusing", "paying", "effort", "holding", "payout", "infects",
        "disrupted", "requesting", "stating", "instruct", "extorting",
        "wannacry",
    ],
    "Phishing": [
        "appear", "defraud", "trick", "hit", "phishing", "lure", "claim",
        "pose", "load", "display", "distribute", "redirect", "disguise",
        "pretending", "serve", "impersonate", "create", "scam", "dupe",
        "sent", "craft", "misleading",
    ],
}

# General nouns that imply an event type (link_coref.py:48-50).
GENERAL_NOUNS = {
    "general": ["attack", "attacks", "cyberattacks", "cyber-attack",
                "incident", "incidents", "threats"],
    "Databreach": ["breach", "breaches"],
    "PatchVulnerability": ["patch", "patches"],
}

# General nouns that imply an argument type (link_coref.py:57).
GENERAL_ARG = {
    "Vulnerability": ["flaw", "flaws", "issues", "issue", "bug", "bugs"],
    "Patch": ["patch", "release", "update"],
}

# Argument entity type -> legal roles per event subtype
# (link_coref.py:59-81; note the reference's own 'Number-of-victim'
# casing in Databreach and the string-valued DiscoverVulnerability
# Version entry are preserved semantically as lists here).
ROLE_PAIR = {
    "Phishing": {
        "Capabilities": ["Attack-Pattern"],
        "File": ["Trusted-Entity", "Tool"],
        "GPE": ["Place"],
        "Money": ["Damage-Amount"],
        "Number": ["Number-of-Victim"],
        "Organization": ["Attacker", "Victim", "Trusted-Entity"],
        "Person": ["Attacker", "Victim", "Trusted-Entity"],
        "Website": ["Trusted-Entity", "Tool"],
        "System": ["Trusted-Entity"],
        "PII": ["Trusted-Entity"],
        "Malware": ["Tool"],
        "Purpose": ["Purpose"],
        "Time": ["Time"],
        "Data": ["Trusted-Entity"],
    },
    "Ransom": {
        "Capabilities": ["Attack-Pattern"],
        "Money": ["Ransom-Price"],
        "Time": ["Time"],
        "Organization": ["Attacker", "Victim"],
        "GPE": ["Place"],
        "File": ["Tool"],
        "Person": ["Attacker", "Victim"],
        "PaymentMethod": ["Payment-Method"],
        "Device": ["Victim"],
        "System": ["Victim"],
        "Number": ["Number-of-Victim"],
        "Malware": ["Tool"],
        "Website": ["Victim"],
    },
    "Databreach": {
        "Data": ["Compromised-Data"],
        "Money": ["Damage-Amount"],
        "Time": ["Time"],
        "Organization": ["Attacker", "Victim"],
        "GPE": ["Place"],
        "File": ["Tool"],
        "Person": ["Attacker", "Victim"],
        "Device": ["Victim"],
        "System": ["Victim"],
        "Number": ["Number-of-victim", "Number-of-Compromised-Data"],
        "Website": ["Victim"],
        "PII": ["Compromised-Data"],
        "Malware": ["Tool"],
        "Capabilities": ["Attack-Pattern"],
        "Purpose": ["Purpose"],
    },
    "DiscoverVulnerability": {
        "Time": ["Time"],
        "Organization": ["Attacker", "Victim"],
        "Version": ["Vulnerable-System-Version"],
        "Person": ["Discoverer", "Vulnerable-System-Owner"],
        "Vulnerability": ["Vulnerability"],
        "CVE": ["CVE"],
        "Device": ["Vulnerable-System", "Supported-Platform"],
        "System": ["Vulnerable-System", "Supported-Platform"],
        "Capabilities": ["Capabilities"],
        "Website": ["Vulnerable-System", "Supported-Platform"],
    },
    "PatchVulnerability": {
        "Time": ["Time"],
        "Organization": ["Patch-Releaser", "Vulnerable-System-Owner"],
        "Version": ["Patch-Number", "Vulnerable-System-Version"],
        "Person": ["Patch-Releaser", "Vulnerable-System-Owner"],
        "Vulnerability": ["Vulnerability"],
        "CVE": ["CVE"],
        "Device": ["Vulnerable-System", "Supported-Platform"],
        "System": ["Vulnerable-System", "Supported-Platform"],
        "Capabilities": ["Issues-Addressed"],
        "Patch": ["Patch"],
        "Website": ["Vulnerable-System", "Supported-Platform"],
    },
}

REALIS_VALUES = ["Actual", "Generic", "Other"]

# NER whitelist (parseJsontoFeatures.py:164-165): types kept by the
# feature pipeline; everything else reset to 'O'.
NER_WHITELIST = [
    "ORGANIZATION", "PERSON", "LOCATION", "CITY", "COUNTRY",
    "STATE_OR_PROVINCE", "NATIONALITY", "DATE", "TIME", "DURATION",
    "MONEY", "NUMBER", "PERCENT", "ORDINAL", "MISC", "CAUSE_OF_DEATH",
    "CRIMINAL_CHARGE", "IDEOLOGY", "RELIGION", "TITLE", "URL", "EMAIL",
    "HANDLE", "SET",
]

# Event coreference clustering configuration (link_coref.py:2041-2042,
# linkage/threshold at :1670, feature weights at :1653-1679).
COREF_WEIGHTS = [0.141, 0.177, 0.14, 0.148, 0.112, 0.141, 0.141]
COREF_THRESHOLD = 0.75

# Similarity threshold for verb->trigger-type inference (link_coref.py:997).
TRIGGER_SIM_THRESHOLD = 0.68

# Must-have-argument -> forced trigger rules (recheck, link_coref.py:1027-1126).
FORCED_TRIGGER = {
    "PaymentMethod": "Ransom",
    "Patch": "PatchVulnerability",
    "Vulnerability": "DiscoverVulnerability",
    "PII": "Databreach",
    "Data": "Databreach",
}
