"""Semantic tests for text-analysis + multimodal operators."""

from pyspark.sql import functions as F

from tranquility_spark.operators import multimodal as mm
from tranquility_spark.operators import text as tx


def test_predict_lang_markers(spark):
    rows = [
        (1, "the cat and the dog of the house"),
        (2, "le chat et la maison et le chien"),
        (3, "der hund und die katze und der vogel"),
        (4, "el gato y los perros que corren"),
        (5, "xyzzy plugh quux"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["p"] for r in df.select("doc_id", tx.predict_lang(F.col("text")).alias("p")).collect()}
    assert out == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "unk"}


def test_token_count_arithmetic(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "single"), (3, "")], "id long, text string")
    out = {r["id"]: r["n"] for r in df.select("id", tx.token_count(F.col("text")).alias("n")).collect()}
    assert out == {1: 3, 2: 1, 3: 0}


def test_quality_features_shape(spark):
    df = spark.createDataFrame([(1, "the quick brown fox and the dog")], "doc_id long, text string")
    row = tx.quality_features(df).first()
    assert row["n_tokens"] == 7
    assert 0.0 <= row["quality_score"] <= 1.0
    assert row["stopword_ratio"] > 0  # 'the' ×2 + 'and'


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["f"] for r in df.select("doc_id", tx.fingerprint_md5(F.col("text")).alias("f")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_rolling_hash_deterministic_and_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["h"] for r in df.select("doc_id", tx.rolling_token_hash(F.col("text")).alias("h")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]  # order-sensitive (rolling, not bag-of-words)


def test_multimodal_decode_plumbing(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "wider payload here")], "doc_id long, text string")
    media = mm.attach_binary_payload(df)
    # payload is real binary with typed metadata
    schema = dict(media.dtypes)
    assert schema["payload"] == "binary"
    out = {r["doc_id"]: r for r in mm.decode_image_features(media).collect()}
    assert out[1]["n_bytes"] == 3
    assert out[1]["width"] == 3 and out[1]["height"] == 21
    assert out[1]["checksum"] == sum(b"abc")
    assert out[2]["n_bytes"] == len("wider payload here")
    assert out[1]["media_type"] == "image/fake"
