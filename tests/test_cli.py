"""CLI surface tests (subprocess — the CLI owns its own Ray session)."""

import json
import subprocess
import sys


def run_cli(*args):
    return subprocess.run([sys.executable, "-m", "yaschva_ray.cli", *args],
                          capture_output=True, text=True, cwd="/root/repo")


def test_check_pass_and_fail(tmp_path):
    schema = tmp_path / "s.json"
    schema.write_text('{"name": "string", "age": {"$number": {"min": 0}}}')
    ok = tmp_path / "ok.json"
    ok.write_text('{"name": "x", "age": 3}')
    bad = tmp_path / "bad.json"
    bad.write_text('{"name": 1, "age": -2}')

    r = run_cli("check", "--schema", str(schema), "--value", str(ok))
    assert r.returncode == 0
    assert json.loads(r.stdout)["result"] == "pass"

    r2 = run_cli("check", "--schema", str(schema), "--value", str(bad))
    assert r2.returncode == 1
    out = json.loads(r2.stdout)
    assert out["output"]["name"]["error"] == "Value is not a string"
    assert out["output"]["age"]["error"] == "Value is smaller than the required minimum"


def test_validate_missing_input(tmp_path):
    schema = tmp_path / "s.json"
    schema.write_text('{"a": "string"}')
    r = run_cli("validate", "--schema", str(schema),
                "--input", str(tmp_path / "nope-*.parquet"),
                "--out", str(tmp_path / "out"), "--num-cpus", "2")
    assert r.returncode == 2
    assert "no input files" in r.stderr
