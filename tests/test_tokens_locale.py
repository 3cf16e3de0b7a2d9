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
