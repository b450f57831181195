"""[EXT] Persisted-stream-state parameter guard.

Every incremental stream in this package merges each micro-batch into
state whose MEANING depends on build parameters: a CMS sketch's cells are
addressed by (width, depth), a KMV sketch's hashes by its salt, a rollup's
bucket keys by the truncation granularity. Restarting a stream against
existing state with different parameters does not fail — it MERGES
incompatible state silently (differently-hashed cells summed together,
differently-salted hashes unioned, hour- and day-truncated keys mixed in
one table). The r12 suite-fingerprint guard closed this for the
constraint stream (streaming/quality.py); this module is the generic form
the sketch and rollup streams share.

Protocol (same as the quality guard, ADVICE r12): the first build stamps
a canonical JSON of the parameters at ``{path}/_params.json`` via
CREATE-EXCLUSIVE — two streams first-building the same path concurrently
get exactly one winner, and the loser's parameters must MATCH the
winner's stamp or the build fails loudly. A state dir with committed
versions but no stamp predates the guard and is NOT silently adopted:
the operator vouches via :func:`stamp_params`.
"""

from __future__ import annotations

import json

from ..operators.manifest_target import _is_already_exists
from .rollup import _fs


def _canonical(params: dict) -> str:
    out = {}
    for k in sorted(params):
        v = params[k]
        out[k] = sorted(v) if isinstance(v, (set, frozenset)) else v
    return json.dumps(out, sort_keys=True, default=str)


def check_or_stamp_params(
    spark, path: str, params: dict, has_state: bool
) -> None:
    """Verify (or first-stamp) ``params`` at ``{path}/_params.json``.

    ``has_state``: whether the path already holds committed stream state
    (the caller's ``_committed(...) != []``) — an unstamped dir WITH
    state fails loudly instead of being retro-stamped with whatever the
    next build presents."""
    fp = _canonical(params)
    fs, stamp = _fs(spark, f"{path}/_params.json")
    jpath = spark._jvm.org.apache.hadoop.fs.Path

    def _mismatch(persisted: str) -> ValueError:
        return ValueError(
            f"stream state at {path} was built with different parameters — "
            "merging across parameter changes silently corrupts the state "
            "(sketch cells/hashes/bucket keys are parameter-addressed); "
            "start a new state path when parameters change.\n"
            f"persisted: {persisted}\ncurrent:   {fp}"
        )

    def _read_stamp() -> str:
        stream = fs.open(stamp)
        try:
            raw = bytes(stream.readAllBytes()).decode("utf-8")
        finally:
            stream.close()
        return json.loads(raw)["params"]

    if fs.exists(stamp):
        persisted = _read_stamp()
        if persisted != fp:
            raise _mismatch(persisted)
        return
    if has_state:
        raise ValueError(
            f"stream state at {path} has committed versions but no "
            "parameter stamp — it predates the guard, and the parameters "
            "that built it cannot be verified. Either restart from a fresh "
            "state path, or — if you are CERTAIN the parameters are "
            "unchanged — opt in explicitly with stamp_params(spark, path, "
            "params) before starting the stream."
        )
    fs.mkdirs(jpath(path))
    doc = json.dumps({"params": fp}).encode("utf-8")
    try:
        out = fs.create(stamp, False)
    except Exception as e:
        if _is_already_exists(e):
            persisted = _read_stamp()  # lost the first-stamp race
            if persisted != fp:
                raise _mismatch(persisted)
            return
        raise
    try:
        out.write(bytearray(doc))
    finally:
        out.close()


def stamp_params(spark, path: str, params: dict) -> None:
    """EXPLICIT opt-in for pre-guard state dirs: force-write the parameter
    stamp, overwriting any prior one. Only for state built before the
    guard existed where the operator can vouch the parameters never
    changed — never to silence a genuine mismatch."""
    fs, stamp = _fs(spark, f"{path}/_params.json")
    fs.mkdirs(spark._jvm.org.apache.hadoop.fs.Path(path))
    out = fs.create(stamp, True)
    try:
        out.write(
            bytearray(
                json.dumps({"params": _canonical(params)}).encode("utf-8")
            )
        )
    finally:
        out.close()
