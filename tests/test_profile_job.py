"""profile_job e2e: the analyzer family wired into the observability job
— run_profile returns a JSON-able report with every opt-in analyzer
populated, and the chi-squared categorical store round-trips across
snapshots."""

from __future__ import annotations

import json
import sys


def _job(name):
    sys.path.insert(0, "jobs")
    import profile_job

    return getattr(profile_job, name)


def test_run_profile_full_analyzer_report(spark, tmp_path):
    run_profile = _job("run_profile")
    df = spark.createDataFrame(
        [
            (1, "en", 10.0, 20.0, "o1"),
            (2, "en", 20.0, 40.0, "o1"),
            (3, "de", 30.0, 60.0, "o2"),
            (4, "de", 40.0, 80.0, "o2"),
            (5, "de", 50.0, 99.0, "o2"),
        ],
        "id bigint, lang string, x double, y double, grp string",
    )
    rep = run_profile(
        spark,
        df,
        output=str(tmp_path / "out"),
        snapshot="s1",
        moments_columns=("x",),
        benford_columns=("x",),
        entropy_columns=("lang",),
        corr_pairs=("x:y",),
        fd_specs=("grp->lang",),
        chi2_columns=("lang",),
    )
    json.dumps(rep, default=str)  # must be serializable (the CLI contract)
    assert rep["moments"]["x"]["mean"] == 30.0
    assert sum(r["n"] for r in rep["benford"]["x"]) == 5
    assert rep["entropy"]["lang"]["n_categories"] == 2
    assert rep["correlation"]["x:y"]["corr"] > 0.999  # y ~ 2x (one off point)
    assert rep["fd"]["grp->lang"]["n_violating_keys"] == 0  # grp -> lang holds
    assert "chi2" in rep and rep["chi2"] == {}  # no baseline yet: store only


def test_run_profile_chi2_roundtrip_across_snapshots(spark, tmp_path):
    run_profile = _job("run_profile")
    out = str(tmp_path / "out")
    base = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(10)], "id bigint, lang string"
    )
    run_profile(spark, base, output=out, snapshot="s1", chi2_columns=("lang",))
    cur = spark.createDataFrame(
        [(i, "en") for i in range(10)], "id bigint, lang string"
    )
    rep = run_profile(
        spark, cur, output=out, snapshot="s2",
        baseline_snapshot="s1", chi2_columns=("lang",),
    )
    row = rep["chi2"]["lang"]
    assert row["chi2"] > 0.4  # 50/50 -> 100/0 is a hard shift
    assert row["n_new_categories"] == 0

    # FD with a real violation is reported with affected-row counts
    bad = spark.createDataFrame(
        [(1, "o1", "en"), (2, "o1", "de"), (3, "o2", "en")],
        "id bigint, grp string, lang string",
    )
    rep2 = run_profile(
        spark, bad, output=out, snapshot="s3", fd_specs=("grp->lang",)
    )
    assert rep2["fd"]["grp->lang"] == {
        "n_violating_keys": 1, "n_rows_affected": 2,
    }


def test_run_profile_privacy_gini_jackknife(spark, tmp_path):
    run_profile = _job("run_profile")
    out = str(tmp_path / "out_pgj")
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", f"s{i % 3}", float(i % 10), 1.0)
         for i in range(60)],
        "id bigint, lang string, source string, v double, one double",
    )
    rep = run_profile(
        spark,
        df,
        output=out,
        snapshot="s1",
        privacy_quasi=("lang", "source"),
        privacy_k=5,
        gini_specs=("v:id",),
        jackknife_specs=("v:one:id",),
    )
    priv = rep["privacy"]
    assert priv["n_classes"] == 6 and priv["k_anonymous"] is True  # classes of 10
    assert 0.0 <= rep["gini"]["v:id"]["gini"] <= 1.0
    jk = rep["jackknife"]["v:one:id"]
    assert jk["ci_lo"] <= jk["ratio"] <= jk["ci_hi"]


def test_run_profile_wq_cfd_json(spark, tmp_path):
    run_profile = _job("run_profile")
    out = str(tmp_path / "out_wcj")
    df = spark.createDataFrame(
        [
            (
                i,
                float(i % 10 + 1),
                1.0,
                "a" if i % 2 else "b",
                i % 5,
                (i % 5) * 10 if i % 2 else i,  # FD k->r holds only for cond 'a'
                '{"k": 1}' if i % 3 else '{"k": "s"}',
            )
            for i in range(60)
        ],
        "id bigint, v double, one double, cond string, k bigint, "
        "r bigint, props string",
    )
    rep = run_profile(
        spark,
        df,
        output=out,
        snapshot="s1",
        wq_specs=("v:one:id",),
        cfd_specs=("cond:k:r",),
        json_specs=("props:$.k|$.absent",),
    )
    wq = {r["q_pct"]: r["value"] for r in rep["weighted_quantiles"]["v:one:id"]}
    assert set(wq) == {25, 50, 75} and wq[25] <= wq[50] <= wq[75]
    cfd = {r["cond"]: r["holds"] for r in rep["cfd"]["cond:k:r"]}
    assert cfd == {"a": True, "b": False}
    jp = {
        (r["path"], r["type_class"]): r["n"]
        for r in rep["json_paths"]["props:$.k|$.absent"]
    }
    assert jp[("$.k", "number")] == 40 and jp[("$.k", "string")] == 20
    assert jp[("$.absent", "missing")] == 60


def test_run_profile_cramers_richness_mh(spark, tmp_path):
    run_profile = _job("run_profile")
    out = str(tmp_path / "out_crm")
    df = spark.createDataFrame(
        [
            (
                i,
                ["en", "de"][i % 2],
                ["web", "news"][i % 2],          # lang fully determines source
                f"k{i % 7}",
                i % 3 == 0,                       # exposure
                (i % 3 == 0) == (i % 6 < 3),      # outcome correlated in strata
                f"s{i % 2}",
            )
            for i in range(80)
        ],
        "id bigint, lang string, source string, key string, "
        "e boolean, o boolean, st string",
    )
    rep = run_profile(
        spark,
        df,
        output=out,
        snapshot="s1",
        cramers_pairs=("lang:source",),
        richness_specs=("key", "key:lang"),
        mh_specs=("e:o:st",),
    )
    # lang == source up to renaming -> V = 1
    assert rep["cramers_v"]["lang:source"]["v"] == 1.0
    # ungrouped richness: 7 keys all seen many times -> coverage 1
    [r] = rep["richness"]["key"]
    assert r["distinct_seen"] == 7 and r["coverage"] == 1.0
    assert len(rep["richness"]["key:lang"]) == 2
    mh = rep["mantel_haenszel"]["e:o:st"]
    assert mh["n_strata"] == 2 and mh["n"] == 80
