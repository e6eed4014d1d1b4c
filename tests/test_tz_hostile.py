"""Always-on pytest gate for the OS-timezone hostility wave
(tools/tz_wave.py, TZWAVE_r11.json): the DST-transition fixture runs
in a fresh process with ``TZ=America/New_York`` exported — JVM,
Python, and DuckDB all inherit the hostile zone — and every observed
hour bucket, window boundary, date_format, and unix round-trip must
equal the hardcoded UTC ground truth. Proves the session's UTC pin
(session.py get_spark/tune) actually severs OS-timezone dependence,
including across the 2024-03-10 US spring-forward where the local
hour 02:xx does not exist."""

from __future__ import annotations


def test_dst_fixture_under_hostile_os_tz():
    from tools.tz_wave import run_dst_fixture
    rec, failures = run_dst_fixture()
    assert not failures, failures
    assert rec["os_tz"] == "America/New_York"
