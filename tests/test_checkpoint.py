"""Resume semantics (SURVEY.md §5 item 4): kill after k partitions →
rerun skips them and total output is identical to an uninterrupted run."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from tanml_ray.sources.pages import synthesize_pages_parquet
from tanml_ray.state.checkpoint import Manifest, lineage_id, run_resumable_validation


@pytest.mark.usefixtures("ray_session")
class TestResume:
    @pytest.fixture()
    def pages_dir(self, sf_dir, tmp_path):
        return synthesize_pages_parquet(sf_dir, str(tmp_path / "pages"))

    def test_full_run_then_noop_rerun(self, pages_dir, tmp_path):
        out = str(tmp_path / "out")
        s1 = run_resumable_validation(pages_dir, out, wave_size=3)
        assert s1["partitions"] == 8
        assert s1["processed_partitions"] == 8
        assert s1["skipped_partitions"] == 0
        assert s1["rows"] == 500
        assert s1["total_violations"] == 6

        s2 = run_resumable_validation(pages_dir, out, wave_size=3)
        assert s2["processed_partitions"] == 0
        assert s2["skipped_partitions"] == 8
        assert s2["total_violations"] == s1["total_violations"]

    def test_partial_resume_identical_output(self, pages_dir, tmp_path):
        out_full = str(tmp_path / "full")
        run_resumable_validation(pages_dir, out_full)

        # simulate a crash: run, then delete 3 partitions from the manifest
        out_resume = str(tmp_path / "resume")
        run_resumable_validation(pages_dir, out_resume)
        mpath = os.path.join(out_resume, "manifest.json")
        m = json.load(open(mpath))
        killed = sorted(m["partitions"])[:3]
        for pid in killed:
            del m["partitions"][pid]
        json.dump(m, open(mpath, "w"))

        s = run_resumable_validation(pages_dir, out_resume)
        assert s["processed_partitions"] == 3
        assert s["skipped_partitions"] == 5

        full = json.load(open(os.path.join(out_full, "manifest.json")))
        resumed = json.load(open(mpath))
        assert set(full["partitions"]) == set(resumed["partitions"])
        for pid in full["partitions"]:
            f, r = full["partitions"][pid], resumed["partitions"][pid]
            assert f["rows"] == r["rows"]
            assert f["violations"] == r["violations"]
            assert f["constraints"] == r["constraints"]

        # violation files byte-comparable as tables
        vdir_f = os.path.join(out_full, "violations")
        vdir_r = os.path.join(out_resume, "violations")
        assert sorted(os.listdir(vdir_f)) == sorted(os.listdir(vdir_r))
        for f in os.listdir(vdir_f):
            tf = pq.read_table(os.path.join(vdir_f, f)).sort_by("url")
            tr = pq.read_table(os.path.join(vdir_r, f)).sort_by("url")
            assert tf.equals(tr)

    def test_lineage_invalidates_on_config_change(self, pages_dir, tmp_path):
        files = sorted(os.path.join(pages_dir, f) for f in os.listdir(pages_dir)
                       if f.endswith(".parquet"))
        a = lineage_id(files, {"constraints": ["x"]})
        b = lineage_id(files, {"constraints": ["y"]})
        assert a != b
        m = Manifest.load_or_create(str(tmp_path / "m.json"), a)
        m.mark_done("p1", rows=10)
        m.save()
        # same lineage → entries kept; different → fresh
        assert Manifest.load_or_create(str(tmp_path / "m.json"), a).done("p1")
        assert not Manifest.load_or_create(str(tmp_path / "m.json"), b).done("p1")
