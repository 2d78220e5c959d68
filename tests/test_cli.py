"""CLI (geomesa_spark/cli.py) — the geomesa-tools analog, driven through
main(argv) in-process so the shared test session's JVM is reused only
where the command builds its own (each command builds a session via
get_spark, which returns the active one in tests)."""

from __future__ import annotations

import json

from geomesa_spark.cli import main


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, out


def test_cli_ingest_query_stats_export_compact(spark, tmp_path, capsys):
    src = tmp_path / "pts.csv"
    src.write_text("id,lon,lat\n" + "\n".join(
        f"{i},{(i * 7) % 360 - 180}.5,{(i * 3) % 170 - 85}.25"
        for i in range(200)))
    spec = tmp_path / "spec.json"
    spec.write_text(json.dumps({
        "fields": {"id": "cast(id as bigint)", "lon": "cast(lon as double)",
                   "lat": "cast(lat as double)"},
        "required": ["lon", "lat"]}))
    store = str(tmp_path / "store")

    rc, out = _run(capsys, ["ingest", "--format", "csv", "--input", str(src),
                            "--spec", str(spec), "--out", store,
                            "--digits", "1"])
    assert rc == 0 and json.loads(out[-1])["ingested"] == 200

    rc, out = _run(capsys, ["query", "--input", store,
                            "--cql", "bbox(geom, -10, -10, 60, 60)",
                            "--max-rows", "500"])
    assert rc == 0
    rows = [json.loads(l) for l in out]
    assert all(-10 <= r["lon"] <= 60 and -10 <= r["lat"] <= 60 for r in rows)
    assert len(rows) > 0

    rc, out = _run(capsys, ["stats", "--input", store,
                            "--stats", "MinMax(lon);Count()"])
    st = json.loads(out[-1])
    assert rc == 0 and st["count"] == 200

    exp = str(tmp_path / "exp.arrow")
    rc, out = _run(capsys, ["export", "--input", store, "--format", "arrow",
                            "--out", exp])
    assert rc == 0 and json.loads(out[-1])["exported"] == 200

    rc, out = _run(capsys, ["compact", "--input", store])
    st = json.loads(out[-1])
    assert rc == 0 and st["rows"] == 200
    assert st["files_after"] <= st["files_before"]
