"""CLI lifecycle test (reference main.py parity, SURVEY §3.1)."""

from yandex_tracker_exporter_spark.main import build_parser, run
from yandex_tracker_exporter_spark.sources.state import FileStateStore


def test_cli_run_once(spark, raw_issues, raw_changelog, tmp_path):
    issues_path = str(tmp_path / "raw_issues")
    changelog_path = str(tmp_path / "raw_changelog")
    raw_issues.write.parquet(issues_path)
    raw_changelog.write.parquet(changelog_path)
    out = str(tmp_path / "wh")
    state_path = str(tmp_path / "state.json")

    args = build_parser().parse_args(
        [
            "--issues", issues_path,
            "--changelog", changelog_path,
            "--output", out,
            "--state", state_path,
            "--backfill-range", "300w",  # fixtures are dated 2023
            "--run-once",
        ]
    )
    results = run(args)
    assert len(results) == 1
    assert results[0].issues == 3 and not results[0].skipped

    # watermark committed → a second run short-circuits (F5)
    results2 = run(args)
    assert results2[0].skipped
    assert FileStateStore(state_path).get("issues") == results[0].watermark


def test_cli_hadoop_state_backend(spark, raw_issues, raw_changelog, tmp_path):
    """--state-backend hadoop commits the watermark through the Hadoop
    FS path (the containerized/object-store deployment shape)."""
    from yandex_tracker_exporter_spark.sources.state import HadoopFileStateStore

    issues_path = str(tmp_path / "raw_issues")
    changelog_path = str(tmp_path / "raw_changelog")
    raw_issues.write.parquet(issues_path)
    raw_changelog.write.parquet(changelog_path)
    state_uri = f"file://{tmp_path}/state.json"

    args = build_parser().parse_args(
        [
            "--issues", issues_path,
            "--changelog", changelog_path,
            "--output", str(tmp_path / "wh2"),
            "--state", state_uri,
            "--state-backend", "hadoop",
            "--backfill-range", "300w",
            "--run-once",
        ]
    )
    results = run(args)
    assert results[0].issues == 3
    assert HadoopFileStateStore(spark, state_uri).get("issues") == results[0].watermark


def test_serverless_handler_contract(spark, raw_issues, raw_changelog, tmp_path, monkeypatch):
    """examples/serverless/main.py: the reference handler(event, context)
    contract — 200/success with counters on a good run, 500 with the
    message (never a raise) on failure."""
    import importlib.util
    import os as os_mod

    spec = importlib.util.spec_from_file_location(
        "serverless_main",
        os_mod.path.join(
            os_mod.path.dirname(os_mod.path.dirname(os_mod.path.abspath(__file__))),
            "examples", "serverless", "main.py",
        ),
    )
    serverless = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serverless)

    issues_path = str(tmp_path / "raw_issues")
    changelog_path = str(tmp_path / "raw_changelog")
    raw_issues.write.parquet(issues_path)
    raw_changelog.write.parquet(changelog_path)
    state_path = str(tmp_path / "wm.json")

    monkeypatch.setenv("EXPORTER_STATEFUL_INITIAL_RANGE", "300w")
    event = {
        "issues": issues_path,
        "changelog": changelog_path,
        "output": str(tmp_path / "wh"),
        "state": state_path,
    }
    response = serverless.handler(event, context=None)
    assert response["statusCode"] == 200 and response["message"] == "success"
    assert response["issues"] == 3 and response["watermark"] is not None

    # second invocation: watermark committed -> up-to-date short-circuit
    response2 = serverless.handler(event, context=None)
    assert response2["statusCode"] == 200 and response2["skipped"]

    # failure path: bad input never raises, returns the 500 body
    bad = serverless.handler({**event, "issues": str(tmp_path / "missing")}, None)
    assert bad["statusCode"] == 500 and "missing" in bad["message"].lower() or (
        bad["statusCode"] == 500 and bad["message"]
    )
