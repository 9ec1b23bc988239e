"""End-to-end CLI tests: the producer+consumer pipeline as subcommands,
batch and paced-streaming forms producing identical hourly metrics."""

from __future__ import annotations

import json

import pytest

from energy_data_stream_processing_spark.__main__ import main


@pytest.fixture()
def events_file(tmp_path):
    p = tmp_path / "events.jsonl"
    lines = []
    for i in range(120):
        t = ["user_login", "view_tariffs", "tariff_switch", "energy_consumed", "bill_payment"][i % 5]
        payload = {"customer_id": f"C{i % 7}", "session_id": i % 20, "channel": "web"}
        if t == "tariff_switch":
            payload["tariff_type"] = "green"
        if t == "energy_consumed":
            payload["energy_consumed"] = str(round(0.5 + (i % 10) / 3.0, 3))
        if t == "bill_payment":
            payload["payment_amount"] = str(round(10 + (i % 9) * 2.5, 2))
        lines.append(json.dumps({
            "event_type": t,
            "event_time": f"2024-02-0{(i % 3) + 1}T{i % 24:02d}:15:00",
            "payload": payload,
        }))
    lines.append("{broken json")
    lines.append(json.dumps({"event_type": "", "event_time": "t", "payload": {"customer_id": "X"}}))
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_cli_pipeline_batch_equals_streaming(spark, events_file, tmp_path, capsys):
    rc = main(["pipeline", "--input", events_file, "--output", str(tmp_path / "b")])
    assert rc == 0
    batch_stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rc = main([
        "pipeline", "--input", events_file, "--output", str(tmp_path / "s"),
        "--streaming", "--lines-per-batch", "40",
    ])
    assert rc == 0
    stream_stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stream_stats["valid"] == batch_stats["valid"] > 0
    assert stream_stats["invalid"] == batch_stats["invalid"] > 0
    assert stream_stats["batches"] >= 3  # paced replay, not one gulp

    b = spark.read.parquet(str(tmp_path / "b" / "hourly_metrics"))
    s = spark.read.parquet(str(tmp_path / "s" / "hourly_metrics"))
    cols = sorted(set(b.columns) & set(s.columns))
    rb = sorted(map(tuple, b.select(cols).collect()))
    rs = sorted(map(tuple, s.select(cols).collect()))
    assert rb == rs and len(rb) > 0
    # dead letter captured the transport-bad and semantic-bad rows
    dl = spark.read.json(str(tmp_path / "b" / "dead_letter"))
    assert dl.count() == batch_stats["invalid"]


def test_cli_list_and_oracle_check(capsys):
    rc = main(["list-queries", "--filter", "hourly_business"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "hourly_business_metrics" in out
    rc = main([
        "oracle-check", "distinct_channels", "--sf-dir", "/root/testdata/sf0.001",
    ])
    assert rc == 0
    assert "MATCH" in capsys.readouterr().out
