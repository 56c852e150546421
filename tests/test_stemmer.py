"""Golden vectors for the vendored Snowball English (Porter2) stemmer.

Primary vector is the reference's own tokenizer test
(/root/reference/search/src/engine/preprocessor.rs:31-41); the rest are
from the published Snowball English sample vocabulary
(snowballstem.org/algorithms/english/stemmer.html).
"""

import pytest

from search_rs_spark.functions.stemmer import stem

# (input, expected) — spot-checks across every algorithm step.
VECTORS = [
    # reference preprocessor.rs golden tokens
    ("the", "the"),
    ("quick", "quick"),
    ("brown", "brown"),
    ("fox", "fox"),
    ("jumps", "jump"),
    ("over", "over"),
    ("lazy", "lazi"),
    ("dog", "dog"),
    # exceptional forms
    ("skis", "ski"),
    ("skies", "sky"),
    ("dying", "die"),
    ("lying", "lie"),
    ("tying", "tie"),
    ("idly", "idl"),
    ("gently", "gentl"),
    ("ugly", "ugli"),
    ("early", "earli"),
    ("only", "onli"),
    ("singly", "singl"),
    ("sky", "sky"),
    ("news", "news"),
    ("howe", "howe"),
    ("atlas", "atlas"),
    ("cosmos", "cosmos"),
    ("bias", "bias"),
    ("andes", "andes"),
    # post-1a invariants
    ("inning", "inning"),
    ("outing", "outing"),
    ("canning", "canning"),
    ("herring", "herring"),
    ("earring", "earring"),
    ("proceed", "proceed"),
    ("exceed", "exceed"),
    ("succeed", "succeed"),
    # step 1a
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "tie"),
    ("cries", "cri"),
    ("gas", "gas"),
    ("this", "this"),
    ("gaps", "gap"),
    ("kiwis", "kiwi"),
    ("consensus", "consensus"),
    # step 1b
    ("agreed", "agre"),
    ("feed", "feed"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    ("hoping", "hope"),
    # step 1c
    ("happy", "happi"),
    ("sky", "sky"),
    ("enjoy", "enjoy"),
    ("cry", "cri"),
    ("by", "by"),
    ("say", "say"),
    # step 2
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("hesitanci", "hesit"),
    ("digitizer", "digit"),
    ("conformabli", "conform"),
    ("radicalli", "radic"),
    ("differentli", "differ"),
    ("vileli", "vile"),
    ("analogousli", "analog"),
    ("vietnamization", "vietnam"),
    ("predication", "predic"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    # step 3
    ("triplicate", "triplic"),
    ("formative", "format"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    # step 4
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("communism", "communism"),
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    # step 5
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
    # misc / general
    ("generate", "generat"),
    ("generates", "generat"),
    ("generated", "generat"),
    ("general", "general"),
    ("generously", "generous"),
    ("running", "run"),
    ("runner", "runner"),
    ("argument", "argument"),
    ("arguments", "argument"),
    ("argued", "argu"),
    ("arguing", "argu"),
    ("searches", "search"),
    ("searching", "search"),
    ("engineering", "engin"),
    ("beautiful", "beauti"),
    ("beauty", "beauti"),
    ("flies", "fli"),
    ("fly", "fli"),
    ("dies", "die"),
    ("die", "die"),
    ("agreement", "agreement"),
]

@pytest.mark.parametrize("word,expected", VECTORS)
def test_stem_vectors(word, expected):
    assert stem(word) == expected


def test_short_words_unchanged():
    for w in ["a", "b", "is", "as", "be", "on", "i"]:
        assert stem(w) == w


def test_idempotent_on_stems():
    # stems of stems should be stable for common outputs
    for w in ["run", "jump", "search", "engin", "hope"]:
        assert stem(stem(w)) == stem(w)
