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
