"""PII detection/redaction pins (operators/pii.py).

Pattern-order and boundary semantics are part of the engine contract:
wider patterns (credit card) must run before narrower ones (phone), and
the IPv4 pattern must enforce octet bounds. The synthetic corpus is also
pinned against its DuckDB mirror (plans/oracle._pii_corpus_sql).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.operators.pii import (
    PII_PATTERNS,
    pii_stats,
    redact_pii,
    synthetic_pii_corpus,
    with_pii_counts,
)
from llm_training_data_pipeline_spark.schemas import load_table
from tests.conftest import SF_DIR


def _one(spark, text: str):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


class TestPatterns:
    def test_card_redacted_before_phone(self, spark):
        """A 16-digit card must become one <CREDIT_CARD>, never a
        half-eaten <PHONE> — pattern application order is significant."""
        df = redact_pii(_one(spark, "pay with 1234 5678 9012 3456 now"))
        out = df.collect()[0]["text"]
        assert out == "pay with <CREDIT_CARD> now"

    def test_phone_still_matches_alone(self, spark):
        out = redact_pii(_one(spark, "call (555) 123-4567 today")).collect()[0]["text"]
        assert "<PHONE>" in out
        assert "123" not in out

    def test_ipv4_octet_bounds(self, spark):
        counts = with_pii_counts(
            _one(spark, "good 255.255.255.255 bad 999.999.999.999 ok 10.0.0.1")
        ).collect()[0]
        # 999... must NOT match (octets are bounded at 255)
        assert counts["n_ipv4"] == 2

    def test_email_and_ssn(self, spark):
        counts = with_pii_counts(
            _one(spark, "mail a.b+c@d-e.org ssn 123-45-6789 not-ssn 1234-56-789")
        ).collect()[0]
        assert counts["n_email"] == 1
        assert counts["n_ssn"] == 1

    def test_no_pii_flag_false(self, spark):
        row = with_pii_counts(_one(spark, "nothing sensitive here")).collect()[0]
        assert row["has_pii"] is False


class TestCorpus:
    def test_corpus_matches_oracle_mirror(self, spark, ddb):
        """synthetic_pii_corpus must be byte-identical to the DuckDB
        mirror — that identity is what makes the driver check meaningful."""
        from llm_training_data_pipeline_spark.plans.oracle import _pii_corpus_sql

        cust = load_table(spark, "customer", SF_DIR)
        sp = {
            r["doc_id"]: r["text"]
            for r in synthetic_pii_corpus(cust).collect()
        }
        du = dict(ddb.execute(_pii_corpus_sql()).fetchall())
        assert sp == du

    def test_every_doc_has_pii(self, spark):
        cust = load_table(spark, "customer", SF_DIR)
        stats = pii_stats(synthetic_pii_corpus(cust)).collect()[0]
        assert stats["n_docs"] == stats["docs_with_pii"]
        assert stats["total_email"] == stats["n_docs"]
        assert stats["total_phone"] >= stats["n_docs"]
        assert 0 < stats["total_ssn"] < stats["n_docs"]

    def test_redaction_removes_everything(self, spark):
        """After redact_pii, every detector must count zero — the battery
        is closed under its own redaction."""
        cust = load_table(spark, "customer", SF_DIR)
        red = redact_pii(synthetic_pii_corpus(cust), "text")
        residual = with_pii_counts(red, "text")
        total = residual.agg(
            *[F.sum(f"n_{name}").alias(name) for name, _p, _t in PII_PATTERNS]
        ).collect()[0]
        assert all(total[name] == 0 for name, _p, _t in PII_PATTERNS)


class TestPipelineStage:
    def test_pii_stage_redacts_in_pipeline(self, spark):
        """The config-gated pii stage scrubs emails/phones from the
        pipeline output text."""
        from llm_training_data_pipeline_spark.plans.config import PipelineConfig
        from llm_training_data_pipeline_spark.plans.pipeline import build_pipeline

        # emails are already stripped by the CLEANING stage (C4) upstream;
        # the pii stage covers what cleaning does not: phones, SSNs, cards
        body = ("spark engine data quality " * 20).strip()
        docs = spark.createDataFrame(
            [
                (i, f"{body} call 555-123-4567 or ssn 123-45-678{i} ok")
                for i in range(4)
            ],
            "doc_id long, text string",
        )
        cfg = PipelineConfig(
            {
                "pii": {"enabled": True},
                "deduplication": {"enabled": False},
                "quality": {"enabled": True, "min_words": 5},
                "tokenization": {"enabled": False},
            }
        )
        out, obs = build_pipeline(docs, cfg)
        rows = out.collect()
        assert rows
        for r in rows:
            assert "555-123-4567" not in r["text"]
            assert "<PHONE>" in r["text"]
            assert "<SSN>" in r["text"]

    def test_pii_stage_drop_action(self, spark):
        from llm_training_data_pipeline_spark.plans.config import PipelineConfig
        from llm_training_data_pipeline_spark.plans.pipeline import build_pipeline

        body = ("clean corpus text without secrets " * 10).strip()
        docs = spark.createDataFrame(
            [
                (1, body),
                (2, body + " but my card is 1234 5678 9012 3456 please"),
            ],
            "doc_id long, text string",
        )
        cfg = PipelineConfig(
            {
                "pii": {"enabled": True, "action": "drop"},
                "deduplication": {"enabled": False},
                "quality": {"enabled": True, "min_words": 5},
                "tokenization": {"enabled": False},
            }
        )
        out, obs = build_pipeline(docs, cfg)
        ids = [r["doc_id"] for r in out.collect()]
        assert ids == [1]
