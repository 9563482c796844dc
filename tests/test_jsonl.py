"""JSONL source + JSON-column parse tests."""

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("lang", StringType()),
    ]
)


def test_read_jsonl_clean_and_quarantine(spark, tmp_path):
    from podcast_crawler_spark.sources.jsonl import read_jsonl

    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"id":1,"lang":"en"}\n'
        '{"id":2,"lang":"de"}\n'
        '{"id":3,"lang":   <-- truncated garbage\n'
        "not json at all\n"
        '{"id":4,"lang":"fr"}\n'
    )
    clean, quarantine = read_jsonl(spark, str(p), SCHEMA)
    got = sorted(map(tuple, clean.collect()))
    assert got == [(1, "en"), (2, "de"), (4, "fr")]
    bad = sorted(r.raw_line for r in quarantine.collect())
    assert bad == [
        "not json at all",
        '{"id":3,"lang":   <-- truncated garbage',
    ]


def test_read_jsonl_schema_pinned_extra_fields_ignored(spark, tmp_path):
    from podcast_crawler_spark.sources.jsonl import read_jsonl

    p = tmp_path / "extra.jsonl"
    p.write_text('{"id":7,"lang":"en","junk":[1,2,3]}\n')
    clean, quarantine = read_jsonl(spark, str(p), SCHEMA)
    assert [tuple(r) for r in clean.collect()] == [(7, "en")]
    assert quarantine.count() == 0


def test_parse_json_rows_corrupt_flag(spark):
    from podcast_crawler_spark.sources.jsonl import parse_json_rows

    df = spark.createDataFrame(
        [
            (1, '{"id":1,"lang":"en"}'),
            (2, '{"id":2,"lang":"de"'),  # truncated
            (3, None),
        ],
        "k long, js string",
    )
    got = {
        r.k: (r.id, r.lang, r.is_corrupt)
        for r in parse_json_rows(df, "js", SCHEMA, keep_cols=("k",)).collect()
    }
    assert got[1] == (1, "en", False)
    assert got[2] == (None, None, True)
    # a NULL input is not "corrupt" — it is absent (upstream null html
    # semantics); fields null, flag false
    assert got[3] == (None, None, False)


def test_parse_json_rows_map_side_only(spark):
    from podcast_crawler_spark.sources.jsonl import parse_json_rows

    df = spark.createDataFrame([(1, '{"id":1}')], "k long, js string")
    plan = (
        parse_json_rows(df, "js", SCHEMA)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan, plan
