"""Round-8 items:

- session config assembly must APPEND the Derby-home flag to pre-existing
  ``spark.driver.extraJavaOptions`` (spark-defaults.conf / env) instead of
  clobbering them (round-8 advice, session.py:44);
- self-gate dtype-parity negative probes: NaN-vs-NULL float columns and
  Decimal-vs-float dtype mixing must FAIL the self-check the way the
  driver's canonicalizer would (verdict item 4);
- gate-prefix generator: the committed ``_FRESH_R8`` list must equal the
  list scripts/gen_gate_prefix.py computes from the CORRECTNESS_r*.json
  evidence history (verdict item 8).
"""

from __future__ import annotations

import os

import pytest


# ---------------------------------------------------------------------------
# session.py: extraJavaOptions append, not clobber
# ---------------------------------------------------------------------------
def test_driver_java_options_appends_to_spark_defaults(tmp_path, monkeypatch):
    from energy_data_stream_processing_spark.session import _driver_java_options

    conf = tmp_path / "conf"
    conf.mkdir()
    (conf / "spark-defaults.conf").write_text(
        "# comment\n"
        "spark.executor.memory 4g\n"
        "spark.driver.extraJavaOptions -Xss4m -Dfoo=bar\n"
    )
    monkeypatch.setenv("SPARK_CONF_DIR", str(conf))
    monkeypatch.delenv("SPARK_DRIVER_EXTRA_JAVA_OPTIONS", raising=False)
    got = _driver_java_options("/tmp/run")
    assert "-Xss4m" in got.split() and "-Dfoo=bar" in got.split()
    assert "-Dderby.system.home=/tmp/run" in got.split()
    # pre-existing flags come first (defaults), ours appended
    assert got.index("-Xss4m") < got.index("-Dderby.system.home")


def test_driver_java_options_env_var_wins_and_no_duplicate(monkeypatch):
    from energy_data_stream_processing_spark.session import _driver_java_options

    monkeypatch.setenv(
        "SPARK_DRIVER_EXTRA_JAVA_OPTIONS",
        "-XX:+UseG1GC -Dderby.system.home=/tmp/run",
    )
    got = _driver_java_options("/tmp/run")
    assert got.split().count("-Dderby.system.home=/tmp/run") == 1
    assert "-XX:+UseG1GC" in got.split()


def test_driver_java_options_bare_default(monkeypatch):
    from energy_data_stream_processing_spark.session import _driver_java_options

    monkeypatch.delenv("SPARK_DRIVER_EXTRA_JAVA_OPTIONS", raising=False)
    monkeypatch.delenv("SPARK_CONF_DIR", raising=False)
    monkeypatch.delenv("SPARK_HOME", raising=False)
    assert _driver_java_options("/x") == "-Dderby.system.home=/x"
