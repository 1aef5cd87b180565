#!/usr/bin/env python3
"""Per-query source fingerprints for change-aware oracle re-sampling
(VERDICT r6 "What's missing" #1).

A query's fingerprint hashes (a) its registry function's own source and
(b) the file bytes of every ``mr_lda_spark`` module its code reaches —
resolved from the code object's ``co_names`` (including nested
lambdas/comprehensions) against the function's globals, recursing
through registry-local helper functions.  A changed fingerprint means
"the code this query executes differs from what the driver last
sampled", which `__spark_entry__._coverage_order` uses to bump the
query into a high-priority re-check bucket.

CLI:
  python tools/fingerprints.py [repo_root]          -> JSON {name: fp}
  python tools/fingerprints.py --snapshot N [root]  -> merge {N: fps}
                                           into <root>/FINGERPRINTS.json
Run with a repo_root pointing at a git-archive checkout to fingerprint
a historical revision (used once to backfill rounds 1-6).
"""
from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys
import types


def _all_names(code) -> set[str]:
    """co_names of a code object and all nested code objects."""
    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _all_names(const)
    return names


def compute_fingerprints(repo_root: str) -> dict[str, str]:
    sys.path.insert(0, repo_root)
    try:
        from mr_lda_spark import queries_registry
    finally:
        sys.path.pop(0)

    pkg_root = os.path.realpath(os.path.join(repo_root, "mr_lda_spark"))
    file_sha: dict[str, str] = {}

    def _mod_sha(mod) -> str | None:
        """sha of a mr_lda_spark module's file, or None if external."""
        f = getattr(mod, "__file__", None)
        if not f:
            return None
        f = os.path.realpath(f)
        if not f.startswith(pkg_root):
            return None
        if f not in file_sha:
            with open(f, "rb") as fh:
                file_sha[f] = hashlib.sha256(fh.read()).hexdigest()
        return file_sha[f]

    _SUBPKGS = (
        "mr_lda_spark",
        "mr_lda_spark.operators",
        "mr_lda_spark.plans",
        "mr_lda_spark.streaming",
        "mr_lda_spark.sources",
        "mr_lda_spark.functions",
    )
    _probe_cache: dict[str, str | None] = {}

    def _probe_module(name: str) -> str | None:
        """Resolve a bare co_name to a mr_lda_spark module's file sha.
        Needed for in-function imports (`from mr_lda_spark.operators
        import curation` inside the query body), where the module never
        lands in the function's globals."""
        if name in _probe_cache:
            return _probe_cache[name]
        import importlib

        sha = None
        for pkg in _SUBPKGS:
            try:
                mod = importlib.import_module(f"{pkg}.{name}")
            except Exception:
                continue
            sha = _mod_sha(mod)
            if sha:
                break
        _probe_cache[name] = sha
        return sha

    def _fp(fn, h, seen: set) -> None:
        if fn in seen:
            return
        seen.add(fn)
        try:
            h.update(inspect.getsource(fn).encode())
        except (OSError, TypeError):
            h.update(repr(fn).encode())
        code = getattr(fn, "__code__", None)
        if code is None:
            return
        g = getattr(fn, "__globals__", {})
        for name in sorted(_all_names(code)):
            obj = g.get(name)
            if obj is None:
                s = _probe_module(name)
                if s:
                    h.update(s.encode())
                continue
            if isinstance(obj, types.ModuleType):
                s = _mod_sha(obj)
                if s:
                    h.update(s.encode())
            elif isinstance(obj, types.FunctionType):
                mod = sys.modules.get(obj.__module__)
                if mod is None or not obj.__module__.startswith(
                    "mr_lda_spark"
                ):
                    continue
                if obj.__module__ == fn.__module__:
                    _fp(obj, h, seen)  # registry-local helper: recurse
                else:
                    s = _mod_sha(mod)
                    if s:
                        h.update(s.encode())
            elif inspect.isclass(obj) and getattr(
                obj, "__module__", ""
            ).startswith("mr_lda_spark"):
                s = _mod_sha(sys.modules.get(obj.__module__))
                if s:
                    h.update(s.encode())

    fps: dict[str, str] = {}
    for name, fn in queries_registry.QUERIES.items():
        h = hashlib.sha256()
        _fp(fn, h, set())
        fps[name] = h.hexdigest()[:16]
    return fps


def main() -> None:
    args = [a for a in sys.argv[1:]]
    snap_round = None
    if "--snapshot" in args:
        i = args.index("--snapshot")
        snap_round = args[i + 1]
        del args[i : i + 2]
    repo_root = args[0] if args else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    fps = compute_fingerprints(repo_root)
    if snap_round is None:
        print(json.dumps(fps, indent=0, sort_keys=True))
        return
    # merge into the CANONICAL repo's FINGERPRINTS.json (repo_root may
    # be a historical checkout being backfilled)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FINGERPRINTS.json",
    )
    snaps = {}
    if os.path.exists(out):
        with open(out) as fh:
            snaps = json.load(fh)
    snaps[str(snap_round)] = fps
    with open(out, "w") as fh:
        json.dump(snaps, fh, indent=0, sort_keys=True)
    print(f"FINGERPRINTS.json round {snap_round}: {len(fps)} queries")


if __name__ == "__main__":
    main()
