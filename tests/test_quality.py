"""Data-quality tier: constraint suites, k-anonymity, PSI drift, SQ8 ANN.

Covers the semantics the oracle queries can't isolate: planted violations
with exactly-known metrics, the suppress->re-certify loop, PSI clamping of
out-of-range current values, the single-scan plan shape of the row-local
constraint pass, and SQ8 recall/rerank-exactness against exact cosine.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.quality import (
    check_constraints,
    k_anonymity_report,
    psi_report,
    suppress_to_k,
)


def _cert(df):
    return {
        (r["constraint"], r["column"]): (r["metric"], r["passed"])
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        # (id, email, age, status, dept)
        (1, "a@x.com", 30, "active", "eng"),
        (2, "b@x.com", 45, "active", "eng"),
        (3, None, 200, "weird", "ops"),  # null email, age OOB, bad status
        (4, "d@x.com", 25, "inactive", "ops"),
        (5, "a@x.com", 31, "active", "eng"),  # duplicate email
    ]
    return spark.createDataFrame(
        rows, "id long, email string, age long, status string, dept string"
    )


class TestCheckConstraints:
    def test_planted_metrics_exact(self, spark, people):
        cert = _cert(
            check_constraints(
                people,
                [
                    {"kind": "not_null", "col": "email"},
                    {"kind": "unique", "col": "email"},
                    {"kind": "between", "col": "age", "lo": 0, "hi": 120},
                    {
                        "kind": "in_set",
                        "col": "status",
                        "values": ["active", "inactive"],
                    },
                    {"kind": "matches", "col": "email", "pattern": "@x\\.com$"},
                    {"kind": "min_rows", "n": 3},
                ],
            )
        )
        assert cert[("not_null", "email")] == (4 / 5, False)
        # 3 distinct of 4 non-null emails
        assert cert[("unique", "email")] == (3 / 4, False)
        assert cert[("between", "age")] == (4 / 5, False)
        assert cert[("in_set", "status")] == (4 / 5, False)
        assert cert[("matches", "email")] == (1.0, True)
        assert cert[("min_rows", "*")] == (5.0, True)

    def test_foreign_key_and_fd(self, spark, people):
        ref = spark.createDataFrame(
            [("eng",), ("sales",)], "dept string"
        )
        cert = _cert(
            check_constraints(
                people,
                [
                    {
                        "kind": "foreign_key",
                        "col": "dept",
                        "ref": "depts",
                        "ref_col": "dept",
                    },
                    # dept -> status does NOT hold (eng has active only ->
                    # holds; ops has weird+inactive -> violated): 1/2 groups
                    {
                        "kind": "functional_dependency",
                        "det": ["dept"],
                        "dep": "status",
                    },
                ],
                refs={"depts": ref},
            )
        )
        # 3 of 5 dept values (eng) found in ref
        assert cert[("foreign_key", "dept->depts.dept")] == (3 / 5, False)
        assert cert[("functional_dependency", "dept->status")] == (1 / 2, False)

    def test_empty_input_vacuously_true(self, spark, people):
        cert = _cert(
            check_constraints(
                people.limit(0),
                [
                    {"kind": "not_null", "col": "email"},
                    {"kind": "unique", "col": "email"},
                    {"kind": "between", "col": "age", "lo": 0, "hi": 120},
                    {"kind": "min_rows", "n": 1},
                ],
            )
        )
        # no rows -> no violations for fraction constraints...
        assert cert[("not_null", "email")][1] is True
        assert cert[("unique", "email")][1] is True
        assert cert[("between", "age")][1] is True
        # ...but a row-count floor legitimately fails
        assert cert[("min_rows", "*")] == (0.0, False)

    def test_unknown_kind_and_empty_suite_raise(self, people):
        with pytest.raises(ValueError, match="unknown constraint kind"):
            check_constraints(people, [{"kind": "nope"}])
        with pytest.raises(ValueError, match="empty constraint suite"):
            check_constraints(people, [])

    def test_row_local_suite_is_single_scan(self, spark, people, tmp_path):
        """The efficiency contract: N row-local constraints = ONE scan."""
        p = str(tmp_path / "people.parquet")
        people.write.parquet(p)
        df = spark.read.parquet(p)
        cert = check_constraints(
            df,
            [
                {"kind": "not_null", "col": "email"},
                {"kind": "unique", "col": "email"},
                {"kind": "between", "col": "age", "lo": 0, "hi": 120},
                {"kind": "matches", "col": "email", "pattern": "@"},
                {"kind": "min_rows", "n": 1},
            ],
        )
        plan = cert._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 1, plan


class TestValidateRows:
    SUITE = [
        {"kind": "not_null", "col": "email"},
        {"kind": "between", "col": "age", "lo": 0, "hi": 120},
        {"kind": "in_set", "col": "status", "values": ["active", "inactive"]},
    ]

    def test_labels_and_routing(self, people):
        from postgres_cdc_reconciliation_spark.operators.quality import (
            quarantine_split,
            validate_rows,
        )

        v = {r["id"]: r for r in validate_rows(people, self.SUITE).collect()}
        # row 3: null email + age 200 + status 'weird' -> all three labels,
        # in suite order
        assert v[3]["violations"] == [
            "not_null:email",
            "between:age",
            "in_set:status",
        ]
        assert v[3]["is_valid"] is False
        assert v[1]["violations"] == [] and v[1]["is_valid"] is True
        ok, bad = quarantine_split(people, self.SUITE)
        assert ok.columns == people.columns
        assert {r["id"] for r in ok.collect()} == {1, 2, 4, 5}
        assert {r["id"] for r in bad.collect()} == {3}
        assert "violations" in bad.columns

    def test_null_conforms_except_not_null(self, spark):
        from postgres_cdc_reconciliation_spark.operators.quality import (
            validate_rows,
        )

        df = spark.createDataFrame([(None,)], "age long")
        r = validate_rows(
            df, [{"kind": "between", "col": "age", "lo": 0, "hi": 1}]
        ).collect()[0]
        assert r["violations"] == [] and r["is_valid"] is True

    def test_non_row_local_rejected(self, people):
        from postgres_cdc_reconciliation_spark.operators.quality import (
            validate_rows,
        )

        with pytest.raises(ValueError, match="not row-local"):
            validate_rows(people, [{"kind": "unique", "col": "email"}])
        with pytest.raises(ValueError, match="empty constraint suite"):
            validate_rows(people, [])

    def test_map_only_no_shuffle(self, people):
        from postgres_cdc_reconciliation_spark.operators.quality import (
            validate_rows,
        )

        plan = (
            validate_rows(people, self.SUITE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan


class TestConstraintCounters:
    ROW_LOCAL = [
        {"kind": "not_null", "col": "email"},
        {"kind": "between", "col": "age", "lo": 0, "hi": 120},
        {"kind": "in_set", "col": "status", "values": ["active", "inactive"]},
        {"kind": "matches", "col": "email", "pattern": "@x\\.com$"},
        {"kind": "min_rows", "n": 3},
    ]

    def test_certificate_equivalence(self, people):
        """counters -> certificate == check_constraints, row for row."""
        from postgres_cdc_reconciliation_spark.operators.quality import (
            constraint_counters,
            counters_to_certificate,
        )

        via_counters = sorted(
            map(
                tuple,
                counters_to_certificate(
                    constraint_counters(people, self.ROW_LOCAL)
                ).collect(),
            )
        )
        direct = sorted(
            map(tuple, check_constraints(people, self.ROW_LOCAL).collect())
        )
        assert via_counters == direct

    def test_counters_are_additive(self, people):
        """Counters over two halves sum to the whole-table counters — the
        mergeability the streaming verifier builds on."""
        from postgres_cdc_reconciliation_spark.operators.quality import (
            constraint_counters,
        )

        whole = {
            r["cid"]: (r["num"], r["den"])
            for r in constraint_counters(people, self.ROW_LOCAL).collect()
        }
        a = constraint_counters(
            people.where(F.col("id") <= 2), self.ROW_LOCAL
        ).collect()
        b = constraint_counters(
            people.where(F.col("id") > 2), self.ROW_LOCAL
        ).collect()
        summed = {}
        for r in list(a) + list(b):
            n, d = summed.get(r["cid"], (0, None))
            summed[r["cid"]] = (
                n + r["num"],
                None if r["den"] is None else (d or 0) + r["den"],
            )
        assert summed == whole

    def test_non_additive_kind_rejected(self, people):
        from postgres_cdc_reconciliation_spark.operators.quality import (
            constraint_counters,
        )

        with pytest.raises(ValueError, match="not additive"):
            constraint_counters(people, [{"kind": "unique", "col": "email"}])


class TestKAnonymity:
    @pytest.fixture(scope="class")
    def pii(self, spark):
        rows = (
            [("10001", "F", i) for i in range(12)]  # class of 12 — safe
            + [("10001", "M", i) for i in range(3)]  # class of 3 — at risk
            + [("94107", "F", i) for i in range(1)]  # singleton — at risk
        )
        return spark.createDataFrame(rows, "zip string, sex string, id long")

    def test_report_exact(self, pii):
        r = k_anonymity_report(pii, ["zip", "sex"], k=5).collect()[0]
        assert r["n_rows"] == 16
        assert r["n_classes"] == 3
        assert r["min_class_size"] == 1
        assert r["classes_below_k"] == 2
        assert r["rows_below_k"] == 4
        assert r["risk_share"] == 4 / 16
        assert r["is_k_anonymous"] is False

    def test_suppress_then_recertify(self, pii):
        anon = suppress_to_k(pii, ["zip", "sex"], k=5)
        assert anon.count() == 12
        assert anon.columns == pii.columns
        r = k_anonymity_report(anon, ["zip", "sex"], k=5).collect()[0]
        assert r["is_k_anonymous"] is True
        assert r["rows_below_k"] == 0

    def test_empty_is_vacuously_anonymous(self, pii):
        r = k_anonymity_report(pii.limit(0), ["zip", "sex"], k=5).collect()[0]
        assert r["n_rows"] == 0 and r["is_k_anonymous"] is True

    def test_bad_k_raises(self, pii):
        with pytest.raises(ValueError, match="k must be"):
            k_anonymity_report(pii, ["zip"], k=0)
        with pytest.raises(ValueError, match="k must be"):
            suppress_to_k(pii, ["zip"], k=-1)

    def test_null_qi_class_consistent_with_report(self, spark):
        """k_anonymity_report groups the NULL class like any other, so
        suppress_to_k must keep a NULL-QI class with >= k members — a plain
        equi join would drop every NULL-QI row and contradict the report's
        is_k_anonymous verdict (ADVICE r11)."""
        rows = (
            [(None, "F", i) for i in range(6)]  # NULL class of 6 — safe
            + [("10001", "F", i) for i in range(7)]  # class of 7 — safe
            + [(None, None, i) for i in range(2)]  # NULL class of 2 — risky
        )
        pii = spark.createDataFrame(rows, "zip string, sex string, id long")
        r = k_anonymity_report(pii, ["zip", "sex"], k=5).collect()[0]
        assert r["is_k_anonymous"] is False and r["rows_below_k"] == 2
        anon = suppress_to_k(pii, ["zip", "sex"], k=5)
        got = {(x["zip"], x["sex"], x["id"]) for x in anon.collect()}
        assert got == {(None, "F", i) for i in range(6)} | {
            ("10001", "F", i) for i in range(7)
        }
        # the survivors re-certify, NULL classes included
        r2 = k_anonymity_report(anon, ["zip", "sex"], k=5).collect()[0]
        assert r2["is_k_anonymous"] is True


class TestPsi:
    def _mk(self, spark, values):
        return spark.createDataFrame([(float(v),) for v in values], "x double")

    def test_identical_distributions_zero(self, spark):
        vals = [float(i) for i in range(100)]
        ref = self._mk(spark, vals)
        rows = psi_report(self._mk(spark, vals), ref, "x", n_buckets=5).collect()
        assert len(rows) == 5
        assert all(r["psi_contrib"] == 0.0 for r in rows)
        assert rows[0]["psi_total"] == 0.0

    def test_planted_drift_positive_and_clamped(self, spark):
        ref = self._mk(spark, range(100))  # lo=0, hi=99
        # current mass far above the reference max -> clamps into bucket 9
        cur = self._mk(spark, [500.0] * 50 + [-10.0] * 50)
        rows = {r["bucket"]: r for r in psi_report(cur, ref, "x", 10).collect()}
        assert set(rows) == set(range(10))
        assert rows[9]["cur_share"] == 0.5  # clamped high
        assert rows[0]["cur_share"] == 0.5  # clamped low
        assert rows[0]["psi_total"] > 0.25  # action-level drift
        # shares sum to 1 on both sides
        assert abs(sum(r["ref_share"] for r in rows.values()) - 1.0) < 1e-12

    def test_constant_reference_single_bucket(self, spark):
        ref = self._mk(spark, [7.0] * 10)
        cur = self._mk(spark, [7.0] * 4)
        rows = {r["bucket"]: r for r in psi_report(cur, ref, "x", 4).collect()}
        assert rows[0]["ref_share"] == 1.0 and rows[0]["cur_share"] == 1.0
        assert rows[0]["psi_contrib"] == 0.0

    def test_empty_reference_loud_nulls_not_crash(self, spark):
        ref = self._mk(spark, [])
        cur = self._mk(spark, [1.0, 2.0])
        rows = psi_report(cur, ref, "x", 4).collect()
        assert len(rows) == 4
        assert all(r["ref_share"] is None for r in rows)

    def test_bad_buckets_raise(self, spark):
        df = self._mk(spark, [1.0])
        with pytest.raises(ValueError, match="n_buckets"):
            psi_report(df, df, "x", n_buckets=1)


class TestCategoricalDrift:
    def _mk(self, spark, vals):
        return spark.createDataFrame([(v,) for v in vals], "cat string")

    def test_identical_zero_and_anchoring(self, spark):
        from postgres_cdc_reconciliation_spark.operators.quality import (
            categorical_drift,
        )

        vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 20
        ref = self._mk(spark, vals)
        rows = categorical_drift(self._mk(spark, vals), ref, "cat", 4).collect()
        assert {r["category"] for r in rows} == {"a", "b", "c", "__other__"}
        assert all(r["psi_contrib"] == 0.0 for r in rows)
        assert rows[0]["psi_total"] == 0.0

    def test_new_category_lands_in_other(self, spark):
        from postgres_cdc_reconciliation_spark.operators.quality import (
            categorical_drift,
        )

        ref = self._mk(spark, ["a"] * 50 + ["b"] * 50)
        cur = self._mk(spark, ["a"] * 30 + ["b"] * 30 + ["NEW"] * 40)
        rows = {
            r["category"]: r
            for r in categorical_drift(cur, ref, "cat", 3).collect()
        }
        assert rows["__other__"]["ref_share"] == 0.0
        assert rows["__other__"]["cur_share"] == 0.4
        assert rows["__other__"]["psi_total"] > 0.25  # action-level

    def test_pooling_and_tiebreak_deterministic(self, spark):
        from postgres_cdc_reconciliation_spark.operators.quality import (
            categorical_drift,
        )

        # b and c tie on count: ties break by VALUE, so top-2 = {a, b}
        ref = self._mk(spark, ["a"] * 3 + ["b"] * 2 + ["c"] * 2)
        rows = {
            r["category"]
            for r in categorical_drift(ref, ref, "cat", 3).collect()
        }
        assert rows == {"a", "b", "__other__"}

    def test_bad_max_categories(self, spark):
        from postgres_cdc_reconciliation_spark.operators.quality import (
            categorical_drift,
        )

        df = self._mk(spark, ["a"])
        with pytest.raises(ValueError, match="max_categories"):
            categorical_drift(df, df, "cat", 1)


class TestSQ:
    @pytest.fixture(scope="class")
    def vecs(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def test_scales_exact_on_planted(self, spark):
        from postgres_cdc_reconciliation_spark.operators.similarity import (
            sq_scales,
        )

        df = spark.createDataFrame(
            [
                (1, [1.0, -254.0, 0.0]),
                (2, [-2.0, 127.0, 0.0]),
            ],
            "vec_id long, embedding array<float>",
        )
        s = sq_scales(df)
        assert s == [2.0 / 127.0, 254.0 / 127.0, 0.0]

    def test_encode_clamps_and_zero_dim(self, spark):
        from postgres_cdc_reconciliation_spark.operators.similarity import (
            sq_encode,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 5.0, 3.0])], "vec_id long, embedding array<float>"
        )
        # scale 0.001 would put 5.0 at code 5000 -> clamps to 127
        codes = sq_encode(df, [0.001, 0.0, 1.0]).collect()[0]["codes"]
        assert codes == [127, 0, 3]

    def test_recall_vs_exact_and_rerank_exactness(self, vecs):
        from postgres_cdc_reconciliation_spark.operators.similarity import (
            cosine_topk,
            sq_scales,
            sq_topk,
        )

        q = vecs.filter(F.col("vec_id") < 8)
        scales = sq_scales(vecs)
        exact = {
            (r["query_id"], r["neighbor_id"]): r["cos"]
            for r in cosine_topk(q, vecs, k=5).collect()
        }
        sq = sq_topk(q, vecs, scales, k=5).collect()
        hit = sum((r["query_id"], r["neighbor_id"]) in exact for r in sq)
        recall = hit / len(exact)
        assert recall >= 0.8, f"SQ8 recall@5 {recall}"  # measured 0.95+ here
        # rerank path returns EXACT cosines for the pairs it keeps
        rr = sq_topk(q, vecs, scales, k=5, rerank=20).collect()
        exact_all = {
            (r["query_id"], r["neighbor_id"]): r["cos"]
            for r in cosine_topk(q, vecs, k=50).collect()
        }
        for r in rr:
            key = (r["query_id"], r["neighbor_id"])
            if key in exact_all:
                assert r["cos"] == pytest.approx(exact_all[key], abs=1e-12)

    def test_nonfinite_components_fit_and_quantize_to_zero(self, spark):
        """One NaN/Inf reading must neither become a dimension's scale nor
        poison a dot product (NaN would rank FIRST under Spark ordering)."""
        from postgres_cdc_reconciliation_spark.operators.similarity import (
            sq_encode,
            sq_scales,
            sq_topk,
        )

        nan, inf = float("nan"), float("inf")
        df = spark.createDataFrame(
            [
                (1, [nan, 127.0, 1.0]),
                (2, [2.0, inf, 1.0]),
                (3, [-4.0, -127.0, nan]),
            ],
            "vec_id long, embedding array<float>",
        )
        s = sq_scales(df)
        # dims fit on FINITE components only; dim 2's only finite values are 1.0
        assert s == [4.0 / 127.0, 1.0, 1.0 / 127.0]
        codes = {
            r["vec_id"]: r["codes"] for r in sq_encode(df, s).collect()
        }
        assert codes[1][0] == 0 and codes[2][1] == 0 and codes[3][2] == 0
        top = sq_topk(df, df, s, k=2).collect()
        assert all(
            r["cos"] == r["cos"] and abs(r["cos"]) <= 1.0 + 1e-12 for r in top
        )

    def test_codes_path_value_identical(self, vecs):
        """Scoring off the persisted codes table == scoring off the raw
        vectors (same quantize-dequantize round trip, exact double math)."""
        from postgres_cdc_reconciliation_spark.operators.similarity import (
            sq_encode,
            sq_scales,
            sq_topk,
            sq_topk_codes,
        )

        q = vecs.filter(F.col("vec_id") < 4)
        scales = sq_scales(vecs)
        direct = sorted(
            map(tuple, sq_topk(q, vecs, scales, k=5).collect())
        )
        via_codes = sorted(
            map(
                tuple,
                sq_topk_codes(q, sq_encode(vecs, scales), scales, k=5).collect(),
            )
        )
        assert direct == via_codes

    def test_empty_corpus_raises(self, vecs):
        from postgres_cdc_reconciliation_spark.operators.similarity import (
            sq_scales,
        )

        with pytest.raises(ValueError, match="empty corpus|empty input"):
            sq_scales(vecs.limit(0))


class TestFacade:
    def test_facade_methods(self, spark, sf_dir):
        from postgres_cdc_reconciliation_spark.engine import Engine

        e = Engine(spark)
        c = spark.read.parquet(f"{sf_dir}/customer.parquet")
        cert = e.check_constraints(
            c, [{"kind": "not_null", "col": "c_custkey"}]
        ).collect()
        assert cert[0]["passed"] is True
        k = e.k_anonymity(c, ["c_mktsegment"], k=2).collect()[0]
        assert k["n_classes"] >= 1
        sup = e.suppress_to_k(c, ["c_mktsegment"], k=2)
        assert sup.count() <= c.count()
        psi = e.drift_psi(c, c, "c_acctbal", n_buckets=4).collect()
        assert len(psi) == 4 and psi[0]["psi_total"] == 0.0
        v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        top = e.ann_sq_topk(v.filter(F.col("vec_id") < 2), v, k=3).collect()
        assert len(top) > 0
        cd = e.categorical_drift(c, c, "c_mktsegment", max_categories=3)
        assert cd.collect()[0]["psi_total"] == 0.0
        vr = e.validate_rows(c, [{"kind": "not_null", "col": "c_name"}])
        assert "violations" in vr.columns
        ok, bad = e.quarantine_split(
            c, [{"kind": "not_null", "col": "c_name"}]
        )
        assert ok.count() + bad.count() == c.count()
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        small = c.select(F.col("c_custkey").alias("l_suppkey")).limit(5)
        pj = e.prefilter_join(li, small, "l_suppkey", mode="exact")
        assert pj.count() == li.join(small, "l_suppkey").count()
