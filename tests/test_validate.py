"""Fixture determinism, constraint semantics, and the end-to-end
flagship validation pipeline on sf0.001 (SURVEY.md §7.1 minimum slice)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tanml_ray.functions.html_text import extract_text
from tanml_ray.sources.pages import make_pages_batch
from tanml_ray.stages.constraints import (
    ExtractionMatch,
    NotNull,
    ReferentialSet,
    RegexMatch,
    TimestampRange,
    default_pages_constraints,
    evaluate_constraints,
)


def _docs_batch(n=600, start=0):
    return pa.table({
        "doc_id": pa.array(range(start, start + n), type=pa.int64()),
        "text": [f"body text number {i} with words" for i in range(start, start + n)],
        "lang": ["en" if i % 3 else "de" for i in range(start, start + n)],
    })


class TestPagesFixture:
    def test_deterministic_and_split_invariant(self):
        whole = make_pages_batch(_docs_batch(600))
        again = make_pages_batch(_docs_batch(600))
        assert whole.equals(again)
        # generating in two halves yields identical rows (pure per-row fn)
        a = make_pages_batch(_docs_batch(300, 0))
        b = make_pages_batch(_docs_batch(300, 300))
        assert pa.concat_tables([a, b]).equals(whole)

    def test_injected_defects(self):
        t = make_pages_batch(_docs_batch(1000))
        ids = t.column("page_id").to_numpy()
        html = t.column("html")
        text = t.column("text")
        lang = t.column("lang").to_pylist()
        assert html.null_count == sum(1 for i in ids if i % 500 == 3)
        assert text.null_count == sum(1 for i in ids if i % 500 == 11)
        assert sum(1 for l, i in zip(lang, ids) if l == "xx") == sum(
            1 for i in ids if i % 300 == 5)
        urls = t.column("url").to_pylist()
        assert len(set(urls)) == len(urls) - sum(1 for i in ids if i % 200 == 7)

    def test_extraction_invariant_holds_except_tampered(self):
        t = make_pages_batch(_docs_batch(1000))
        mismatches = []
        for pid, h, txt in zip(t.column("page_id").to_pylist(),
                               t.column("html").to_pylist(),
                               t.column("text").to_pylist()):
            if h is None or txt is None:
                continue
            if extract_text(h) != txt:
                mismatches.append(pid)
        assert mismatches == [i for i in range(1000)
                              if i % 700 == 17 and i % 500 not in (3, 11)]

    def test_current_variant_shifts(self):
        base = make_pages_batch(_docs_batch(3000))
        cur = make_pages_batch(_docs_batch(3000), variant="current")
        base_len = np.mean([len(x) for x in base.column("text").to_pylist() if x])
        cur_len = np.mean([len(x) for x in cur.column("text").to_pylist() if x])
        assert cur_len > base_len  # padding shift applied
        # extraction invariant must still hold on the shifted variant
        for h, txt in zip(cur.column("html").to_pylist()[:200],
                          cur.column("text").to_pylist()[:200]):
            if h is not None and txt is not None and not txt.endswith(" "):
                assert extract_text(h) == txt


class TestConstraints:
    def _pages(self, n=1000):
        return make_pages_batch(_docs_batch(n))

    def test_not_null(self):
        t = self._pages()
        mask = NotNull("html").violation_mask(t)
        assert pc.sum(mask).as_py() == t.column("html").null_count

    def test_range(self):
        import pandas as pd
        t = self._pages()
        c = TimestampRange("warc_ts", pd.Timestamp("2025-01-01"), pd.Timestamp("2025-04-01"))
        ids = t.column("page_id").to_numpy()
        assert pc.sum(c.violation_mask(t)).as_py() == sum(1 for i in ids if i % 1000 == 13)

    def test_referential(self):
        t = self._pages()
        c = ReferentialSet("lang", {"en", "de"}, name="ref")
        ids = t.column("page_id").to_numpy()
        assert pc.sum(c.violation_mask(t)).as_py() == sum(1 for i in ids if i % 300 == 5)

    def test_regex(self):
        t = pa.table({"url": ["https://a", "http://b", "ftp://c", None],
                      "x": [1, 2, 3, 4]})
        c = RegexMatch("url", r"^https?://")
        assert pc.sum(c.violation_mask(t)).as_py() == 1  # ftp only; null passes

    def test_extraction_match(self):
        t = self._pages()
        ids = t.column("page_id").to_numpy()
        expect = sum(1 for i in ids if i % 700 == 17 and i % 500 not in (3, 11))
        assert pc.sum(ExtractionMatch().violation_mask(t)).as_py() == expect

    def test_evaluate_constraints_counts_match_masks(self):
        t = self._pages()
        cs = default_pages_constraints()
        table, counts = evaluate_constraints(t, cs)
        assert table.num_rows == sum(counts.values())
        assert set(table.column_names) == {"constraint_id", "url", "offending_value"}
        for c in cs:
            assert counts[c.constraint_id] == pc.sum(c.violation_mask(t)).as_py()


@pytest.mark.usefixtures("ray_session")
class TestPipelineE2E:
    def test_flagship_on_sf0001(self, sf_dir, tmp_path):
        from tanml_ray.pipelines.validate import run_pages_validation
        from tanml_ray.sources.pages import synthesize_pages_parquet

        pages_dir = synthesize_pages_parquet(sf_dir, str(tmp_path / "pages"))
        rep = run_pages_validation(pages_dir, out_dir=str(tmp_path / "out"))

        assert rep.summary["rows"] == 500
        assert rep.summary["partitions"] == 8
        # exact injected defect counts for ids 0..499
        counts = {}
        for cid, v in zip(rep.status.column("constraint_id").to_pylist(),
                          rep.status.column("violations").to_pylist()):
            counts[cid] = counts.get(cid, 0) + v
        assert counts["not_null_html"] == 1           # id 3
        assert counts["not_null_text"] == 1           # id 11
        assert counts["range_warc_ts"] == 1           # id 13
        assert counts["referential_lang"] == 2        # ids 5, 305
        assert counts["text_extraction_match"] == 1   # id 17
        assert counts["format_url"] == 0
        assert rep.summary["duplicate_urls"] == 3     # ids 7,207,407 dup of prev
        assert rep.summary["overall"] == "fail"

        # violations parquet written and readable
        v = pq.read_table(str(tmp_path / "out" / "violations"))
        assert v.num_rows == sum(counts.values())

        # profile sanity
        assert rep.profile["lang"]["count"] == 500
        assert rep.profile["text_len"]["null_count"] == 1
        assert rep.profile["url"]["approx_distinct"] == pytest.approx(497, rel=0.05)

    def test_partition_invariance(self, sf_dir, tmp_path):
        """Same input at different block counts → identical exact results
        (SURVEY.md §5 item 3)."""
        from tanml_ray.pipelines.validate import run_pages_validation
        from tanml_ray.sources.pages import pages_dataset

        reports = []
        for blocks in (1, 8):
            ds = pages_dataset(sf_dir, override_num_blocks=blocks)
            reports.append(run_pages_validation(ds, check_uniqueness=True))
        r1, r8 = reports
        for key in ("rows", "total_violations", "duplicate_urls"):
            assert r1.summary[key] == r8.summary[key]
        assert r1.profile["text_len"]["mean"] == pytest.approx(
            r8.profile["text_len"]["mean"], rel=1e-12)


@pytest.mark.usefixtures("ray_session")
class TestUniquenessCollisionVerify:
    def test_hash_collisions_are_not_duplicates(self, tmp_path):
        """Narrow the url-hash space (url_hash_mod test hook) so DISTINCT
        urls collide: the verify pass must reject collision-only
        candidates, while true string duplicates still surface with
        exact per-url counts (ADVICE r1: birthday collisions at 10^12
        rows must not flip overall to fail)."""
        import pyarrow.parquet as pq_

        from tanml_ray.pipelines.validate import run_pages_validation

        pages = make_pages_batch(_docs_batch(400))
        # 400 distinct-ish urls through a 16-value hash → guaranteed
        # collisions between distinct strings
        d = tmp_path / "pages"
        d.mkdir()
        pq_.write_table(pages.slice(0, 200), str(d / "a.parquet"))
        pq_.write_table(pages.slice(200, 200), str(d / "b.parquet"))

        rep = run_pages_validation(str(d), check_uniqueness=True,
                                   url_hash_mod=16)
        # fixture injects true dups at ids 7,207 (each dup of prev id) →
        # 2 urls each appearing exactly twice; everything else is a
        # collision the verify pass must discard
        import pandas as pd
        urls = pages.column("url").to_pylist()
        truth = pd.Series(urls).value_counts()
        true_dups = {u: int(n) for u, n in truth.items() if n > 1}
        got = {r["url"]: r["n"] for r in rep.duplicate_urls.take_all()}
        assert got == true_dups
        assert rep.summary["duplicate_urls"] == len(true_dups)

    def test_no_dups_no_collisions_clean(self, tmp_path):
        """All-unique urls with forced collisions → zero duplicates."""
        import pyarrow.parquet as pq_

        from tanml_ray.pipelines.validate import run_pages_validation

        t = pa.table({
            "url": [f"https://site-{i}.example/page" for i in range(300)],
            "warc_ts": pa.array([1700000000_000000 + i for i in range(300)],
                                type=pa.timestamp("us")),
            "html": pa.array([b"<p>x</p>"] * 300, type=pa.binary()),
            "text": ["x"] * 300,
            "lang": ["en"] * 300,
        })
        d = tmp_path / "pages"
        d.mkdir()
        pq_.write_table(t, str(d / "a.parquet"))
        rep = run_pages_validation(str(d), check_uniqueness=True,
                                   url_hash_mod=8,
                                   constraints=[])
        assert rep.summary["duplicate_urls"] == 0
        assert rep.duplicate_urls.count() == 0


@pytest.mark.usefixtures("ray_session")
class TestViolationHeavyInput:
    def test_every_row_violating(self, tmp_path):
        """A constraint that fails on EVERY row must not choke the
        pipeline: violations stream as a Dataset, counts stay exact."""
        import pyarrow.parquet as pq_

        from tanml_ray.pipelines.validate import run_pages_validation
        from tanml_ray.stages.constraints import RegexMatch

        pages = make_pages_batch(_docs_batch(400))
        d = tmp_path / "pages"
        d.mkdir()
        pq_.write_table(pages.slice(0, 200), str(d / "a.parquet"))
        pq_.write_table(pages.slice(200, 200), str(d / "b.parquet"))

        # impossible url pattern → every row violates
        rep = run_pages_validation(str(d),
                                   constraints=[RegexMatch("url", r"^ftp://",
                                                           name="impossible")],
                                   check_uniqueness=False)
        counts = dict(zip(rep.status.column("constraint_id").to_pylist(),
                          rep.status.column("violations").to_pylist()))
        assert sum(rep.status.column("violations").to_pylist()) == 400
        assert rep.summary["overall"] == "fail"
        v = rep.violations.take(5)
        assert all(r["constraint_id"] == "impossible" for r in v)


@pytest.mark.usefixtures("ray_session")
class TestDistributedUhashPath:
    def test_zero_budget_forces_distributed_merge(self, tmp_path):
        """uhash_driver_budget=0 forces the per-bucket distributed
        groupby (the ≥10^8-url path, no driver gather of hash blobs);
        results must be identical to the driver path."""
        import pyarrow.parquet as pq_

        from tanml_ray.pipelines.validate import run_pages_validation

        pages = make_pages_batch(_docs_batch(400))
        d = tmp_path / "pages"
        d.mkdir()
        pq_.write_table(pages.slice(0, 200), str(d / "a.parquet"))
        pq_.write_table(pages.slice(200, 200), str(d / "b.parquet"))

        fast = run_pages_validation(str(d), check_uniqueness=True)
        dist = run_pages_validation(str(d), check_uniqueness=True,
                                    uhash_driver_budget=0)
        assert fast.summary["duplicate_urls"] == dist.summary["duplicate_urls"] > 0
        assert (sorted(fast.duplicate_urls.take_all(), key=lambda r: r["url"])
                == sorted(dist.duplicate_urls.take_all(), key=lambda r: r["url"]))


# ---------------------------------------------------------------------------
# LengthRange + CrossField constraint types
# ---------------------------------------------------------------------------

def test_length_range_constraint():
    import pyarrow as pa

    from tanml_ray.stages.constraints import LengthRange

    t = pa.table({"text": pa.array(["", "ok", "x" * 10, None])})
    c = LengthRange("text", lo=1, hi=5)
    mask = c.violation_mask(t).to_pylist()
    # empty violates lo; 10-char violates hi; null passes
    assert mask == [True, False, True, False]
    assert c.constraint_id == "length_text"


def test_cross_field_constraint():
    import pandas as pd
    import pyarrow as pa

    from tanml_ray.stages.constraints import CrossField

    t = pa.table({
        "fetch_ts": pa.array(pd.to_datetime(
            ["2025-01-01", "2025-03-01", "2025-02-01", None])),
        "warc_ts": pa.array(pd.to_datetime(
            ["2025-01-02", "2025-02-01", "2025-02-01", "2025-01-01"]))})
    c = CrossField("fetch_ts", "le", "warc_ts")
    mask = c.violation_mask(t).to_pylist()
    # row 2 has fetch after warc -> violation; null row passes
    assert mask == [False, True, False, False]
    with pytest.raises(ValueError, match="unknown op"):
        CrossField("a", "nope", "b")


def test_new_constraints_via_registry():
    import pyarrow as pa

    from tanml_ray.registry import registry

    lr, cf = registry.build_suite([
        {"kind": "length_range", "column": "text", "lo": 2},
        {"kind": "cross_field", "left": "a", "op": "lt", "right": "b"}])
    assert lr.violation_mask(
        pa.table({"text": ["a", "abc"]})).to_pylist() == [True, False]
    assert cf.violation_mask(
        pa.table({"a": [1, 5], "b": [2, 2]})).to_pylist() == [False, True]


@pytest.mark.usefixtures("ray_session")
def test_aggregate_constraints_over_status(tmp_path):
    from tanml_ray.pipelines.validate import (
        evaluate_aggregate_constraints,
        run_pages_validation,
    )
    from tanml_ray.sources.pages import synthesize_pages_parquet

    pages = synthesize_pages_parquet("/root/testdata/sf0.001",
                                     str(tmp_path / "pages"))
    rep = run_pages_validation(pages)
    agg = evaluate_aggregate_constraints(rep, [
        {"kind": "max_violation_rate",
         "source_constraint": "not_null_text", "max_rate": 0.5},
        {"kind": "max_violation_rate",
         "source_constraint": "referential_lang", "max_rate": 0.0,
         "name": "no_bad_langs"},
        {"kind": "min_rows", "min_rows": 1},
    ]).to_pylist()
    by_cid = {}
    for r in agg:
        by_cid.setdefault(r["constraint_id"], []).append(r)
    # every partition got one row per rule
    n_parts = len({r["partition_id"] for r in agg})
    assert all(len(v) == n_parts for v in by_cid.values())
    # the fixture plants referential_lang violations -> rate 0.0 fails
    assert any(r["status"] == "fail" for r in by_cid["no_bad_langs"])
    # permissive 50% not-null budget passes everywhere
    assert all(r["status"] == "pass"
               for r in by_cid["agg_rate_not_null_text"])
    assert all(r["status"] == "pass" for r in by_cid["agg_min_rows"])
    with pytest.raises(ValueError, match="unknown aggregate"):
        evaluate_aggregate_constraints(rep, [{"kind": "nope"}])


class TestSequenceAndMonitoringChecks:
    """The round-5 monitoring checks: out-of-order detection must fire
    on a planted inversion (the sf testdata is clean, so the oracle
    gate only proves the zero path), and the volume/freshness checks
    must flag planted anomalies."""

    def _events_dir(self, tmp_path, ts_us, users=None):
        n = len(ts_us)
        t = pa.table({
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
            "user_id": pa.array(users or [1] * n, type=pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n, type=pa.float64()),
            "props": pa.array(["{}"] * n),
        })
        pq.write_table(t, str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def test_out_of_order_detects_planted_inversion(self, ray_session,
                                                    tmp_path):
        from tanml_ray.pipelines.queries import out_of_order_events

        base = 1_700_000_000_000_000
        # user 1: in order; user 2: third event jumps BACK before the
        # second -> exactly one inversion, one affected user
        ts = [base, base + 10, base + 20,          # user 1
              base, base + 50, base + 30]          # user 2 (inverted)
        users = [1, 1, 1, 2, 2, 2]
        out = out_of_order_events(
            self._events_dir(tmp_path, ts, users)).to_pylist()[0]
        assert out["out_of_order"] == 1
        assert out["affected_users"] == 1
        assert out["n_users"] == 2
        assert not out["is_ordered"]

    def test_out_of_order_clean_sequence(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import out_of_order_events

        base = 1_700_000_000_000_000
        out = out_of_order_events(self._events_dir(
            tmp_path, [base + 10 * i for i in range(8)],
            [1, 2] * 4)).to_pylist()[0]
        assert out["out_of_order"] == 0
        assert out["is_ordered"]

    def test_volume_control_flags_spike_day(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import volume_control_events

        day_us = 86_400_000_000
        # 17 days of 10 rows, one day of 200 rows. (With a single
        # outlier among n otherwise-equal days its z is exactly
        # sqrt(n-1), so n must exceed 10 for |z| > 3: sqrt(17)≈4.12.)
        ts = []
        for d in range(18):
            ts.extend([d * day_us + i for i in range(200 if d == 5 else 10)])
        rows = volume_control_events(
            self._events_dir(tmp_path, ts)).to_pylist()
        alerts = [r for r in rows if r["alert"]]
        assert len(rows) == 18
        assert len(alerts) == 1 and alerts[0]["n"] == 200

    def test_freshness_lag_flags_stale_feed(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import freshness_lag_events

        day_us = 86_400_000_000
        n = 6
        t = pa.table({
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array([5 * day_us, 5 * day_us + 1, 2 * day_us,
                            5 * day_us - 3600_000_000, day_us, day_us + 5],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * n, type=pa.int64()),
            "event_type": pa.array(["fresh", "fresh", "stale3d",
                                    "hour_old", "stale4d", "stale4d"]),
            "value": pa.array([1.0] * n, type=pa.float64()),
            "props": pa.array(["{}"] * n),
        })
        pq.write_table(t, str(tmp_path / "events.parquet"))
        rows = {r["event_type"]: r for r in
                freshness_lag_events(str(tmp_path)).to_pylist()}
        assert not rows["fresh"]["stale"] and rows["fresh"]["lag_hours"] == 0
        assert not rows["hour_old"]["stale"]          # 1h < 24h
        assert rows["stale3d"]["stale"] and rows["stale4d"]["stale"]
        assert rows["stale4d"]["lag_hours"] == pytest.approx(96.0, abs=1e-6)


class TestIntegrityAudits:
    """Planted-defect coverage for the column-integrity audits (the sf
    testdata is clean, so the oracle gate only proves the zero path)."""

    def test_props_conformance_detects_bad_payloads(self, ray_session,
                                                    tmp_path):
        from tanml_ray.pipelines.queries import props_conformance_events

        props = ['{"k": 1}', '{"k": 2}',       # conformant
                 'not json at all',            # invalid
                 '[1, 2, 3]',                  # valid, not an object
                 '{"other": 5}',               # object, missing k
                 '{"k": "str"}']               # k present, wrong type
        n = len(props)
        t = pa.table({
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1] * n, type=pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n, type=pa.float64()),
            "props": pa.array(props),
        })
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = props_conformance_events(str(tmp_path)).to_pylist()[0]
        assert out == {"n": 6, "n_valid_json": 5, "n_object": 4,
                       "n_with_k": 2,
                       "conformance_rate": pytest.approx(2 / 6, abs=1e-6),
                       "conformant": False}

    def test_embedding_norm_audit_detects_bad_vectors(self, ray_session,
                                                      tmp_path):
        from tanml_ray.pipelines.queries import embedding_norm_audit

        vecs = [[3.0, 4.0], [0.0, 0.0], [float("nan"), 1.0], [6.0, 8.0]]
        t = pa.table({
            "vec_id": pa.array(range(4), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array([0] * 4, type=pa.int32()),
        })
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        out = embedding_norm_audit(str(tmp_path)).to_pylist()[0]
        assert out["n"] == 4
        assert out["n_nonfinite"] == 1
        assert out["n_zero_norm"] == 1
        assert out["min_norm"] == 0.0
        assert out["max_norm"] == 10.0
        assert out["mean_norm"] == pytest.approx(15.0 / 3, abs=1e-6)

    def test_metadata_consistency_detects_stale_counts(self, ray_session,
                                                       tmp_path):
        from tanml_ray.pipelines.queries import metadata_consistency_documents

        t = pa.table({
            "doc_id": pa.array(range(4), type=pa.int64()),
            "text": pa.array(["abcd", "héllo", None, "xy"]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            # héllo is 5 codepoints; stored 6 is stale; null text skipped
            "n_chars": pa.array([4, 6, 99, 2], type=pa.int64()),
        })
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = metadata_consistency_documents(str(tmp_path)).to_pylist()[0]
        assert out["n"] == 4 and out["n_checked"] == 3
        assert out["n_mismatched"] == 1
        assert not out["consistent"]
