"""Locale-aware rule-based tokenizer (functions.text.tokens_locale) vs a
Python-side oracle (the same rule engine run driver-side), plus golden
pins translated from the reference's TokenizerTest.java and the JFlex
grammar rules (text-tokenization-jflex/.../JFlexTokenizerDefaultRules.inc,
JFlexEnglishLexer.jflex:28-40)."""

from pyspark.sql import functions as F

from dagli_spark.functions.text import accent_folded, tokenize_text, tokens_locale


def test_golden_reference_cases():
    # TokenizerTest.java: "The quick brown fox." -> The quick brown fox .
    assert tokenize_text("The quick brown fox.", "en") == \
        ["The", "quick", "brown", "fox", "."]
    # English contraction rules (JFlexEnglishLexer.jflex:30-33)
    assert tokenize_text("Don't stop", "en") == ["Do", "n't", "stop"]
    assert tokenize_text("I'll go, you've seen it", "en") == \
        ["I", "'ll", "go", ",", "you", "'ve", "seen", "it"]
    # ABBREV (JFlexTokenizerDefaultRules.inc {ABBREV})
    assert "U.S." in tokenize_text("the U.S. Department", "en")
    # dates / times / emails / handles are single WORD tokens
    toks = tokenize_text("at 3:45 on 2024-01-02 mail a@b.com via @x #y", "en")
    for t in ["3:45", "2024-01-02", "a@b.com", "@x", "#y"]:
        assert t in toks
    # German locale: no English clitic splitting
    assert tokenize_text("Don't", "de") == ["Don", "'", "t"]
    # generic fallback for unknown locales still tokenizes words
    assert tokenize_text("elephant 42!", "xx") == ["elephant", "42", "!"]


def test_spark_matches_python_oracle(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    got = (
        d.select("doc_id", tokens_locale("text", "en").alias("toks"))
        .orderBy("doc_id").collect()
    )
    exp = {r["doc_id"]: tokenize_text(r["text"], "en")
           for r in d.select("doc_id", "text").collect()}
    assert len(got) > 0
    for r in got:
        assert list(r["toks"]) == exp[r["doc_id"]], r["doc_id"]


def test_null_and_empty(spark):
    df = spark.createDataFrame([(None,), ("",), ("  ",)], "t string")
    rows = df.select(tokens_locale("t", "en").alias("x")).collect()
    assert rows[0]["x"] is None
    assert list(rows[1]["x"]) == []
    assert list(rows[2]["x"]) == []


def test_accent_folded(spark):
    df = spark.createDataFrame(
        [("élève Çà-ñoño ZUPER Straße",), (None,)], "t string")
    rows = df.select(accent_folded("t").alias("x")).collect()
    assert rows[0]["x"] == "eleve Ca-nono ZUPER Straße"  # ß has no mark
    assert rows[1]["x"] is None


def test_golden_shared_macro_rules():
    """Round-3 parity deepening: the remaining shared JFlex macros
    (JFlexTokenizerMacros.inc PNAME/ONAME/CPP/E_WORD/FILENAME/PHONE) each
    yield one WORD token."""
    assert tokenize_text("AT&T and O'Brien", "en") == \
        ["AT&T", "and", "O'Brien"]
    assert tokenize_text("see report.pdf and C++ code", "en") == \
        ["see", "report.pdf", "and", "C++", "code"]
    assert tokenize_text("send e-mail today", "en") == \
        ["send", "e-mail", "today"]
    # PHONE after DATE/TIME, exactly the rule order of
    # JFlexTokenizerDefaultRules.inc
    assert tokenize_text("call 442-253-2131 at 3:45 on 2024-01-02", "en") == \
        ["call", "442-253-2131", "at", "3:45", "on", "2024-01-02"]


def test_golden_english_abbrev_and_prefix():
    """EnglishAbbrev.inc list + JFlexEnglishLexer {prefix}-{WORD}."""
    assert tokenize_text("Dr. Smith of Acme Inc. left", "en") == \
        ["Dr.", "Smith", "of", "Acme", "Inc.", "left"]
    assert tokenize_text("anti-virus is non-trivial", "en") == \
        ["anti-virus", "is", "non-trivial"]
    # abbrev needs the trailing dot — plain 'Dr' stays a WORD
    assert tokenize_text("Dr who", "en") == ["Dr", "who"]


def test_golden_german_rules():
    """JFlexGermanLexer: abbrev lists (Hr./bzw./GermanAbbrev corpus) and
    the {APOSTROPHE}s genitive clitic; English clitics must NOT fire."""
    assert tokenize_text("Hr. Meier bzw. Dr. Weber", "de") == \
        ["Hr.", "Meier", "bzw.", "Dr.", "Weber"]
    assert tokenize_text("Peter’s Haus", "de") == ["Peter", "’s", "Haus"]
    assert tokenize_text("insb. die Str. 5", "de") == \
        ["insb.", "die", "Str.", "5"]


def test_golden_cjk_char_fallback():
    """CJK (Han + Kana) falls back to one token per ideograph instead of
    globbing an unspaced sentence into one WORD (improvement over the
    reference's generic lexer, which TokenizerTest.java:13 itself calls
    'quite poor' on Japanese); Latin runs inside CJK text stay words."""
    assert tokenize_text("日本語です", "ja") == ["日", "本", "語", "で", "す"]
    assert tokenize_text("漢字 and kana カナ", "zh") == \
        ["漢", "字", "and", "kana", "カ", "ナ"]


def test_core_subset_equivalence_fuzz():
    """The driver rows tokens_en_core / tokens_de_core rest on this claim:
    on documents passing the *_CORE_EXCLUDE_RES filters, the FULL locale
    tokenizer equals its lookahead-free core alternation verbatim. Fuzz it
    with deterministic ASCII word soup (incl. abbrev-like words WITHOUT
    dots, numbers, dates, hyphens, punctuation)."""
    import random
    import re

    from dagli_spark.functions.text import (
        DE_CORE_EXCLUDE_RES,
        EN_CORE_EXCLUDE_RES,
        locale_pattern_source,
        locale_pattern_source_en_core,
        tokenize_text,
    )

    vocab = ["alpha", "Mr", "bzw", "Dr", "e-mail", "AT&T", "C++", "1,234.5",
             "12/03/21", "14:30", "report.pdf", "anti-virus", "Ph", "x",
             "#tag", "@user", "...", "==", "!?", "(", ")", ";", "-", "99"]
    rng = random.Random(11)
    cores = {
        "en": (EN_CORE_EXCLUDE_RES,
               re.compile(locale_pattern_source_en_core(), re.I)),
        "de": (DE_CORE_EXCLUDE_RES,
               re.compile(locale_pattern_source("xx"), re.I)),
    }
    checked = 0
    for _ in range(400):
        s = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
        for loc, (filters, core_pat) in cores.items():
            if any(re.search(f, s) for f in filters):
                continue
            assert tokenize_text(s, loc) == core_pat.findall(s), (loc, s)
            checked += 1
    assert checked > 300  # the filters must not exclude everything
