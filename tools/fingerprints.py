#!/usr/bin/env python3
"""Per-query FUNCTION-LEVEL source fingerprints for change-aware oracle
re-sampling (VERDICT r6 "What's missing" #1; granularity shrunk to
function level per VERDICT r7 "Next round" #2).

A query's fingerprint is a digest of the code it can actually reach:
the registry function's own source, plus — recursively — the source of
every package *function/class* its code references (resolved from the
code object's ``co_names``, including nested lambdas/comprehensions,
against the function's globals and against package modules it imports).
Referencing a module no longer hashes the whole module file: only the
attributes the code names are followed.  So editing
``similarity.kmeans_frozen`` re-flags the queries that call it, not
every query that merely imports ``similarity`` (the r7 failure mode:
95 flagged / 50 budget, real changes starved).

Reach rules per referenced object:
  - package function  -> its source + recurse into ITS references
  - package class     -> class source + recurse into its methods
  - package module    -> collected for attribute resolution only
  - container         -> recurse into elements (sorted for set/dict)
  - scalar constant   -> repr
  - functools.partial / __wrapped__ -> recurse into the target
  - anything external -> stable marker (module:qualname), never repr()
    (repr embeds memory addresses — ADVICE r7 #4)

CLI:
  python tools/fingerprints.py [repo_root]          -> JSON {name: fp}
  python tools/fingerprints.py --snapshot N [root]  -> merge {N: fps}
                                           into <root>/FINGERPRINTS.json
Run with a repo_root pointing at a git-archive checkout to fingerprint
a historical revision (used to backfill rounds 1-7 whenever the
algorithm changes — snapshots and live fingerprints must come from the
same algorithm version or every query reads as "changed").
"""
from __future__ import annotations

import functools
import hashlib
import importlib
import inspect
import json
import os
import sys
import types

_SCALARS = (str, bytes, int, float, bool, complex, type(None), range)


def _all_names(code) -> set[str]:
    """co_names of a code object and all nested code objects."""
    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _all_names(const)
    return names


class _Fingerprinter:
    """Digests objects by reachable source, function-level.

    Memoizes per-object digests (id-keyed; objects pinned in ``_keep``
    so ids stay valid).  Digest computation order is deterministic
    given a deterministic query iteration order, so memoized values are
    reproducible across processes.
    """

    def __init__(self, pkg_prefix: str):
        self.pkg = pkg_prefix
        self._memo: dict[int, str] = {}
        self._stack: set[int] = set()
        self._keep: list = []
        self._import_probe: dict[str, types.ModuleType | None] = {}

    # -- helpers ---------------------------------------------------

    def _is_pkg_module(self, mod) -> bool:
        name = getattr(mod, "__name__", "")
        return name == self.pkg or name.startswith(self.pkg + ".")

    def _in_pkg(self, obj) -> bool:
        m = getattr(obj, "__module__", "") or ""
        return m == self.pkg or m.startswith(self.pkg + ".")

    def _probe(self, dotted: str) -> types.ModuleType | None:
        """Import-probe a name as a package (sub)module.  Handles
        in-function imports (``from mr_lda_spark.operators import
        curation`` inside the query body), where the module never
        lands in the function's globals."""
        if dotted in self._import_probe:
            return self._import_probe[dotted]
        mod = None
        candidates = []
        if dotted == self.pkg or dotted.startswith(self.pkg + "."):
            candidates.append(dotted)
        else:
            for sub in ("", ".operators", ".plans", ".streaming",
                        ".sources", ".functions"):
                candidates.append(f"{self.pkg}{sub}.{dotted}")
        for cand in candidates:
            try:
                m = importlib.import_module(cand)
            except Exception:
                continue
            if self._is_pkg_module(m):
                mod = m
                break
        self._import_probe[dotted] = mod
        return mod

    @staticmethod
    def _source(obj) -> str | None:
        try:
            return inspect.getsource(obj)
        except (OSError, TypeError):
            return None

    # -- digests ---------------------------------------------------

    def digest(self, obj) -> str:
        oid = id(obj)
        if oid in self._memo:
            return self._memo[oid]
        if oid in self._stack:
            return "<cycle:%s>" % getattr(obj, "__qualname__", "?")
        self._stack.add(oid)
        try:
            d = self._digest_uncached(obj)
        finally:
            self._stack.discard(oid)
        self._memo[oid] = d
        self._keep.append(obj)
        return d

    def _digest_uncached(self, obj) -> str:
        h = hashlib.sha256()

        def feed(s: str) -> None:
            h.update(s.encode("utf-8", "replace"))

        if isinstance(obj, _SCALARS):
            feed("const:%r" % (obj,))
        elif isinstance(obj, functools.partial):
            feed("partial:%s|%s|%s" % (
                self.digest(obj.func),
                self.digest(obj.args),
                self.digest(tuple(sorted(obj.keywords.items()))),
            ))
        elif isinstance(obj, types.ModuleType):
            # function-level: the module NAME only; attributes the
            # caller names are resolved and digested by the caller.
            feed("mod:%s" % getattr(obj, "__name__", "?"))
        elif isinstance(obj, types.FunctionType):
            self._feed_function(obj, feed)
        elif inspect.isclass(obj):
            self._feed_class(obj, feed)
        elif isinstance(obj, (types.BuiltinFunctionType,
                              types.MethodType)):
            feed("callable:%s:%s" % (
                getattr(obj, "__module__", "?"),
                getattr(obj, "__qualname__", "?")))
        elif isinstance(obj, (tuple, list)):
            feed("seq:%d:" % len(obj))
            for el in obj:
                feed(self.digest(el) + ";")
        elif isinstance(obj, (set, frozenset)):
            feed("set:%d:" % len(obj))
            for ds in sorted(self.digest(el) for el in obj):
                feed(ds + ";")
        elif isinstance(obj, dict):
            feed("dict:%d:" % len(obj))
            items = sorted(
                (repr(k), self.digest(k), self.digest(v))
                for k, v in obj.items())
            for rk, dk, dv in items:
                feed("%s=%s;" % (dk, dv))
        else:
            # instance of something: type identity; if the type is a
            # package class, its source participates too.
            t = type(obj)
            feed("obj:%s:%s" % (
                getattr(t, "__module__", "?"),
                getattr(t, "__qualname__", "?")))
            if self._in_pkg(t):
                feed(self.digest(t))
            wrapped = getattr(obj, "__wrapped__", None)
            if wrapped is not None:
                feed("wrapped:" + self.digest(wrapped))
            # pyspark UDF wrappers / generic function-holders
            fn = getattr(obj, "func", None)
            if isinstance(fn, types.FunctionType) and self._in_pkg(fn):
                feed("func:" + self.digest(fn))
        return h.hexdigest()

    def _feed_function(self, fn, feed) -> None:
        if not self._in_pkg(fn) and getattr(
                fn, "__module__", None) != "__main__":
            # external function: stable identity marker only
            feed("extfn:%s:%s" % (
                getattr(fn, "__module__", "?"),
                getattr(fn, "__qualname__", "?")))
            return
        src = self._source(fn)
        if src is None:  # stable fallback — never repr(fn)
            feed("fn-nosrc:%s:%s" % (
                getattr(fn, "__module__", "?"),
                getattr(fn, "__qualname__", "?")))
        else:
            feed("fn:%s:" % fn.__qualname__)
            feed(src)
        wrapped = getattr(fn, "__wrapped__", None)
        if wrapped is not None and wrapped is not fn:
            feed("wrapped:" + self.digest(wrapped))
        code = getattr(fn, "__code__", None)
        if code is None:
            return
        g = getattr(fn, "__globals__", {})
        names = sorted(_all_names(code))
        # pass 1: collect package modules this function can see —
        # from globals and from in-function imports (dotted co_names).
        mods: list[types.ModuleType] = []
        for name in names:
            obj = g.get(name)
            if isinstance(obj, types.ModuleType):
                if self._is_pkg_module(obj):
                    mods.append(obj)
            elif obj is None:
                m = self._probe(name)
                if m is not None:
                    mods.append(m)
        mods.sort(key=lambda m: m.__name__)
        # pass 2: resolve every name and digest what it refers to.
        for name in names:
            if name.startswith("__") and name.endswith("__"):
                # __file__/__name__/__spec__… — environment-dependent
                # (absolute paths), never code the query executes.
                continue
            obj = g.get(name)
            if obj is None:
                for m in mods:
                    if hasattr(m, name):
                        obj = getattr(m, name)
                        break
            if obj is None or isinstance(obj, types.ModuleType):
                continue
            if isinstance(obj, types.FunctionType) or inspect.isclass(
                    obj) or isinstance(obj, functools.partial):
                if self._in_pkg(obj) or (
                        isinstance(obj, functools.partial)
                        and self._in_pkg(obj.func)):
                    feed("%s=%s;" % (name, self.digest(obj)))
            elif isinstance(obj, _SCALARS + (tuple, list, set,
                                             frozenset, dict)):
                feed("%s=%s;" % (name, self.digest(obj)))
            elif self._in_pkg(type(obj)):
                feed("%s=%s;" % (name, self.digest(obj)))

    def _feed_class(self, cls, feed) -> None:
        if not self._in_pkg(cls):
            feed("extcls:%s:%s" % (
                getattr(cls, "__module__", "?"),
                getattr(cls, "__qualname__", "?")))
            return
        src = self._source(cls)
        feed("cls:%s:" % cls.__qualname__)
        feed(src if src is not None else "<nosrc>")
        for attr_name in sorted(vars(cls)):
            attr = vars(cls)[attr_name]
            if isinstance(attr, (types.FunctionType, staticmethod,
                                 classmethod)):
                fn = getattr(attr, "__func__", attr)
                if isinstance(fn, types.FunctionType):
                    feed("%s=%s;" % (attr_name, self.digest(fn)))


def fingerprint_queries(queries: dict, pkg_prefix: str) -> dict[str, str]:
    """Function-level fingerprints for a {name: callable} registry.

    Exposed separately from :func:`compute_fingerprints` so tests can
    drive it with a synthetic package (ADVICE r7 #2: don't pin tests to
    the live repo's mutable round state)."""
    fper = _Fingerprinter(pkg_prefix)
    return {
        name: fper.digest(fn)[:16]
        for name, fn in queries.items()
    }


def compute_fingerprints(repo_root: str) -> dict[str, str]:
    sys.path.insert(0, repo_root)
    try:
        from mr_lda_spark import queries_registry
    finally:
        sys.path.pop(0)
    return fingerprint_queries(queries_registry.QUERIES, "mr_lda_spark")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    snap_round = None
    check_round = None
    if "--snapshot" in args:
        i = args.index("--snapshot")
        snap_round = args[i + 1]
        del args[i : i + 2]
    if "--check" in args:
        # Commit gate (ADVICE r14 #1): fail if the committed snapshot
        # for round N no longer matches a live recompute of the tree —
        # a diff here means either the snapshot is stale (re-run
        # --snapshot N) or code moved without a re-sweep of its reach
        # set (run tools/parity_sweep.py over the listed queries).
        i = args.index("--check")
        check_round = args[i + 1]
        del args[i : i + 2]
    repo_root = args[0] if args else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    fps = compute_fingerprints(repo_root)
    if check_round is not None:
        snap_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "FINGERPRINTS.json",
        )
        with open(snap_path) as fh:
            snaps = json.load(fh)
        snap = snaps.get(str(check_round), {})
        diff = sorted(
            k for k in set(snap) | set(fps) if snap.get(k) != fps.get(k)
        )
        if diff:
            print(
                f"STALE snapshot round {check_round}: "
                f"{len(diff)} queries differ:\n" + "\n".join(diff)
            )
            raise SystemExit(1)
        print(f"FINGERPRINTS.json round {check_round}: clean ({len(fps)} queries)")
        return
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
