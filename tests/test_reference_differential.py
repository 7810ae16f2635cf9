"""Differential fuzz against the REAL reference implementation.

Strips the TS types off /root/reference/src/*.ts (tools/strip_reference_ts),
runs the result under Node, and compares full validation results — output
trees, error strings, throw messages — against this engine's oracle AND
compiled validator.  Skipped cleanly when Node or the reference checkout is
absent (the rest of the suite carries the ported conformance corpus).
"""

import json
import random
import shutil
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")

from yaschva_ray import SchemaError, UNDEFINED, validate
from yaschva_ray.compiled import compile_validator

from test_compiled import rand_schema, rand_value

NODE = shutil.which("node")
REF = "/root/reference/src/validate.ts"

pytestmark = pytest.mark.skipif(
    NODE is None or not __import__("os").path.exists(REF),
    reason="needs node + the reference checkout",
)

HARNESS = """
import { validate } from './validate.mjs'
import * as readline from 'node:readline'
const rl = readline.createInterface({ input: process.stdin })
const out = []
rl.on('line', (line) => {
  if (!line.trim()) return
  const c = JSON.parse(line)
  const value = c.undef ? undefined : c.value
  let res
  try { res = { ok: validate(c.schema, value) } }
  catch (e) { res = { threw: String(e.message) } }
  out.push(JSON.stringify(res))
})
rl.on('close', () => { process.stdout.write(out.join('\\n') + '\\n') })
"""


@pytest.fixture(scope="module")
def ref_harness(tmp_path_factory):
    from tools.strip_reference_ts import strip_to

    d = tmp_path_factory.mktemp("refjs")
    strip_to(str(d), names=("validationTypes", "validate"))
    (d / "harness.mjs").write_text(HARNESS)
    return str(d / "harness.mjs")


def _clean(o):
    if o is UNDEFINED:
        return None
    if isinstance(o, dict):
        return {k: _clean(v) for k, v in o.items() if v is not UNDEFINED}
    if isinstance(o, list):
        return [_clean(v) for v in o]
    return o


def _js_tree(o):
    if o is UNDEFINED:
        return None
    if isinstance(o, dict):
        return {k: _js_tree(v) for k, v in o.items() if v is not UNDEFINED}
    if isinstance(o, list):
        return [None if v is UNDEFINED else _js_tree(v) for v in o]
    if isinstance(o, int) and not isinstance(o, bool) and abs(o) > 2**53:
        return float(o)
    return o


def test_fuzz_against_real_reference(ref_harness):
    rng = random.Random(424242)
    cases = []
    for _ in range(2000):
        s = rand_schema(rng)
        v = rand_value(rng)
        undef = v is UNDEFINED
        cases.append({"schema": s, "value": None if undef else _clean(v), "undef": undef})
    payload = "\n".join(json.dumps(c) for c in cases)
    proc = subprocess.run([NODE, ref_harness], input=payload,
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[:500]
    refs = [json.loads(l) for l in proc.stdout.strip().split("\n")]
    assert len(refs) == len(cases)

    mismatches = []
    for c, r in zip(cases, refs):
        v = UNDEFINED if c["undef"] else c["value"]
        for impl_name, impl in (("oracle", lambda: validate(c["schema"], v)),
                                ("compiled", lambda: compile_validator(c["schema"])(v))):
            try:
                mine = {"ok": impl()}
            except SchemaError as e:
                mine = {"threw": str(e)}
            if "threw" in r:
                ok = "threw" in mine and mine["threw"] == r["threw"]
            else:
                ok = "ok" in mine and json.loads(
                    json.dumps(_js_tree(mine["ok"]), default=str)) == r["ok"]
            if not ok:
                mismatches.append((impl_name, c, r, mine))
    assert not mismatches, mismatches[:3]


TYPE_HARNESS = """
import { validationToType } from './type.mjs'
import * as readline from 'node:readline'
const rl = readline.createInterface({ input: process.stdin })
const out = []
rl.on('line', (line) => {
  if (!line.trim()) return
  const schema = JSON.parse(line)
  try { out.push(JSON.stringify({ ok: validationToType(schema) })) }
  catch (e) { out.push(JSON.stringify({ threw: true })) }
})
rl.on('close', () => process.stdout.write(out.join('\\n') + '\\n'))
"""


@pytest.fixture(scope="module")
def type_harness(tmp_path_factory):
    from tools.strip_reference_ts import strip_to

    d = tmp_path_factory.mktemp("reftype")
    strip_to(str(d), names=("validationTypes", "validate", "type"))
    (d / "type_harness.mjs").write_text(TYPE_HARNESS)
    return str(d / "type_harness.mjs")


def test_type_emitter_fuzz_against_real_reference(type_harness):
    """validationToType parity: the emitted TS type STRING must equal the
    real reference's, character for character, on random schemas."""
    from yaschva_ray.typegen import TypeGenError, validation_to_type

    rng = random.Random(31337)
    cases = [rand_schema(rng) for _ in range(1200)]
    payload = "\n".join(json.dumps(c) for c in cases)
    proc = subprocess.run([NODE, type_harness], input=payload,
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[:500]
    refs = [json.loads(l) for l in proc.stdout.strip().split("\n")]
    assert len(refs) == len(cases)
    mismatches = []
    for c, r in zip(cases, refs):
        try:
            mine = {"ok": validation_to_type(c)}
        except (TypeGenError, RecursionError):
            mine = {"threw": True}
        if "threw" in r:
            ok = "threw" in mine
        else:
            ok = mine.get("ok") == r["ok"]
        if not ok:
            mismatches.append((c, r, mine))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"
