"""Porter2 / Snowball "english" stemmer tests.

Vectors from the published algorithm description and the snowball
sample vocabulary; includes every stem the scoring parity fixtures
depend on (reference: src/tests/t_scoring.c, src/tests/test.lua).
"""

import pytest

from nxsearch_tpu.text.porter2 import stem

VECTORS = [
    # scoring-fixture critical
    ("jumped", "jump"), ("lazy", "lazi"), ("foxes", "fox"),
    ("fox", "fox"), ("dog", "dog"), ("cats", "cat"),
    ("little", "littl"), ("three", "three"), ("once", "onc"),
    ("upon", "upon"), ("time", "time"), ("there", "there"),
    ("were", "were"), ("quick", "quick"), ("brown", "brown"),
    ("over", "over"), ("the", "the"), ("document", "document"),
    ("including", "includ"), ("tabby", "tabbi"), ("dogs", "dog"),
    ("textbook", "textbook"), ("erlang", "erlang"), ("linux", "linux"),
    ("environment", "environ"), ("unix", "unix"), ("shell", "shell"),
    ("scripting", "script"), ("python", "python"), ("examples", "exampl"),
    ("using", "use"), ("windows", "window"), ("keywords", "keyword"),
    ("java", "java"), ("test", "test"),
    # exceptional forms
    ("skis", "ski"), ("skies", "sky"), ("dying", "die"),
    ("lying", "lie"), ("tying", "tie"), ("idly", "idl"),
    ("gently", "gentl"), ("ugly", "ugli"), ("early", "earli"),
    ("only", "onli"), ("singly", "singl"), ("sky", "sky"),
    ("news", "news"), ("atlas", "atlas"), ("cosmos", "cosmos"),
    ("bias", "bias"), ("andes", "andes"),
    # 1a-exceptions
    ("inning", "inning"), ("outing", "outing"), ("canning", "canning"),
    ("herring", "herring"), ("earring", "earring"),
    ("proceed", "proceed"), ("exceed", "exceed"), ("succeed", "succeed"),
    # general vocabulary
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "tie"),
    ("caress", "caress"), ("consign", "consign"),
    ("consigned", "consign"), ("consigning", "consign"),
    ("consignment", "consign"), ("consist", "consist"),
    ("consisted", "consist"), ("consistency", "consist"),
    ("consistent", "consist"), ("consistently", "consist"),
    ("consisting", "consist"), ("consists", "consist"),
    ("consolation", "consol"), ("consolations", "consol"),
    ("consolatory", "consolatori"), ("console", "consol"),
    ("consoled", "consol"), ("consoles", "consol"),
    ("consolidate", "consolid"), ("consolidated", "consolid"),
    ("consolidating", "consolid"), ("consoling", "consol"),
    ("consolingly", "consol"), ("consols", "consol"),
    ("consonant", "conson"), ("consort", "consort"),
    ("consorted", "consort"), ("consorting", "consort"),
    ("conspicuous", "conspicu"), ("conspicuously", "conspicu"),
    ("conspiracy", "conspiraci"), ("conspirator", "conspir"),
    ("conspirators", "conspir"), ("conspire", "conspir"),
    ("conspired", "conspir"), ("conspiring", "conspir"),
    ("constable", "constabl"), ("constables", "constabl"),
    ("constance", "constanc"), ("constancy", "constanc"),
    ("constant", "constant"),
    ("generate", "generat"), ("generates", "generat"),
    ("generated", "generat"), ("generating", "generat"),
    ("general", "general"), ("generally", "general"),
    ("generic", "generic"), ("generically", "generic"),
    ("generous", "generous"), ("generously", "generous"),
    ("communism", "communism"), ("communist", "communist"),
    ("communities", "communiti"), ("community", "communiti"),
    ("arsenal", "arsenal"), ("arsenic", "arsenic"),
    # steps coverage
    ("national", "nation"), ("rational", "ration"),
    ("agreed", "agre"), ("feed", "feed"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"),
    ("sized", "size"), ("hopping", "hop"), ("tanned", "tan"),
    ("falling", "fall"), ("hissing", "hiss"), ("fizzed", "fizz"),
    ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("relational", "relat"),
    ("conditional", "condit"), ("valenci", "valenc"),
    ("hesitanci", "hesit"), ("digitizer", "digit"),
    ("conformabli", "conform"), ("radicalli", "radic"),
    ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "format"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"),
    ("inference", "infer"), ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"), ("adjustable", "adjust"),
    ("defensible", "defens"), ("irritant", "irrit"),
    ("replacement", "replac"), ("adjustment", "adjust"),
    ("dependent", "depend"), ("adoption", "adopt"),
    ("homologou", "homologou"), ("communism", "communism"),
    ("activate", "activ"), ("angulariti", "angular"),
    ("homologous", "homolog"), ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
    # y-handling
    ("cry", "cri"), ("by", "by"), ("say", "say"), ("crying", "cri"),
    ("yellow", "yellow"), ("youth", "youth"),
    # short words / e-insertion
    ("hoping", "hope"), ("hoped", "hope"), ("hop", "hop"),
    ("caring", "care"), ("care", "care"),
]


@pytest.mark.parametrize("word,expected", VECTORS, ids=[v[0] for v in VECTORS])
def test_stem(word, expected):
    assert stem(word) == expected
