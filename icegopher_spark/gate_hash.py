"""Source-hash staleness detection for the adjudication rotation.

Problem (r11 verdict task #1): the driver adjudicates ~50 of the 208
registry gates per round, so most greens are rounds old while the code
under them keeps moving. The old fix was a hand-maintained
``_STALE_GREEN`` list in ``__spark_entry__.py`` — which only ever
covered the edits someone remembered to list.

This module replaces the hand-list with a mechanical check: for each
gate, compute a *source hash* of the code the gate actually depends on,
twice — once from the working tree, once from the git commit that
recorded the gate's most recent driver adjudication (the add-commit of
that round's ``CORRECTNESS_r{N}.json``; the driver commits all work
before adjudicating, so that commit's tree IS the adjudicated code).
If the two differ, the gate is *stale*: its green was earned by code
that no longer exists, and the rotation re-verifies it ahead of
untouched equally-green gates.

What goes into a gate's hash — chosen so the comparison is computable
both from live files and from historical blobs without importing them:

* the AST dump of the gate's top-level ``FunctionDef`` *including its
  decorators* (so the ``@register(name, oracle, ...)`` call — and with
  it any literal oracle SQL — is covered), plus
* the AST dumps of every top-level function/assignment in the same
  module reachable from it by name (helpers, oracle-SQL module
  variables, shared fragments — a transitive intra-module closure), plus
* the sha256 of every ``icegopher_spark`` module file the closure
  imports, transitively through those modules' own imports (operator
  modules are hashed whole-file: an edit to ``operators/dedup.py``
  should re-verify every dedup gate).

AST dumps (``ast.dump`` without attributes) normalize comments and
formatting, so a comment-only sweep does not flood the rotation.

Failure posture: if git history is unavailable or a historical blob
cannot be read, the adjudicated hash is unknown and the gate is treated
as stale — degrading to "re-verify sooner", never to "trust a green the
code may have outgrown".
"""

from __future__ import annotations

import ast
import datetime
import hashlib
import json
import subprocess
from functools import lru_cache
from pathlib import Path

_PKG_DIR = Path(__file__).resolve().parent
_REPO = _PKG_DIR.parent
_PKG = "icegopher_spark"


# ---------------------------------------------------------------------------
# git plumbing (cached per process)


def _git(*args: str) -> str | None:
    try:
        out = subprocess.run(
            ["git", "-C", str(_REPO), *args],
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    return out.stdout if out.returncode == 0 else None


@lru_cache(maxsize=None)
def _round_commit(round_no: int) -> str | None:
    """Commit that first added CORRECTNESS_r{N}.json — the tree the
    driver adjudicated round N against.

    Untracked-artifact fallback (r12 verdict task #1): the driver drops
    the newest round's JSON into the working tree WITHOUT committing it,
    so ``git log --diff-filter=A`` finds nothing and every gate the
    round just adjudicated would read stale — drowning the real
    staleness signal and failing the pin test. The driver commits all
    build work *before* adjudicating, so the adjudicated tree is the
    last commit whose committer date predates the artifact's mtime. That
    pin keeps post-drop working-tree edits correctly stale (a pure
    working-tree fallback would never flag anything) and keeps post-drop
    *commits* from false-greening under a bare-HEAD fallback.
    """
    rel = f"CORRECTNESS_r{round_no:02d}.json"
    path = _REPO / rel
    if not path.exists():
        return None
    out = _git("log", "--diff-filter=A", "--format=%H", "--", rel)
    lines = [ln for ln in (out or "").splitlines() if ln.strip()]
    if lines:
        # oldest add wins if the file was ever re-added
        return lines[-1]
    # No visible add-commit. The fallback below assumes the file is a
    # freshly-dropped UNTRACKED artifact whose mtime bounds the drop
    # time; a TRACKED file with no reachable add-commit (shallow clone
    # — checkout already reset its mtime to 'now') would false-green
    # every gate of that round, so it must stay unknown → stale.
    tracked = _git("ls-files", "--", rel)
    if tracked and tracked.strip():
        return None
    try:
        mtime = path.stat().st_mtime
    except OSError:
        return None
    stamp = datetime.datetime.fromtimestamp(
        mtime, tz=datetime.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%S +0000")
    out = _git("log", "-1", "--format=%H", f"--until={stamp}")
    lines = [ln for ln in (out or "").splitlines() if ln.strip()]
    return lines[0] if lines else None


@lru_cache(maxsize=None)
def _blob(commit: str, relpath: str) -> str | None:
    """File content at a commit, or None if absent there."""
    return _git("show", f"{commit}:{relpath}")


# ---------------------------------------------------------------------------
# AST analysis — identical logic for current files and historical blobs


@lru_cache(maxsize=None)
def _parse(source_key: tuple) -> ast.Module | None:
    """source_key is ('fs', relpath, mtime_ns) or ('git', commit, relpath)."""
    kind = source_key[0]
    if kind == "fs":
        try:
            text = (_REPO / source_key[1]).read_text()
        except OSError:
            return None
    else:
        text = _blob(source_key[1], source_key[2])
        if text is None:
            return None
    try:
        return ast.parse(text)
    except SyntaxError:
        return None


def _fs_generation() -> int:
    """Max mtime_ns across the package's .py files — one cheap stat
    sweep (~60 files). Baked into every fs-layer cache key so an edit
    in a long-lived process re-keys ALL the lru_caches below; without
    it, current_gate_hash/_symbol_info would keep returning pre-edit
    hashes forever and staleness detection would false-green exactly
    the gates it exists to flag."""
    latest = 0
    for f in _PKG_DIR.rglob("*.py"):
        try:
            latest = max(latest, f.stat().st_mtime_ns)
        except OSError:
            continue
    return latest


def _fs_key(relpath: str) -> tuple:
    try:
        mtime = (_REPO / relpath).stat().st_mtime_ns
    except OSError:
        mtime = -1
    return ("fs", relpath, mtime)


class _ModuleIndex:
    """Top-level name -> node map plus the import table for one module."""

    def __init__(self, tree: ast.Module, modname: str):
        self.defs: dict[str, ast.AST] = {}
        self.imports: dict[str, str] = {}  # local name -> icegopher module
        self.modname = modname
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                self.defs[node.name] = node
            elif isinstance(node, ast.Assign):
                for tgt in node.targets:
                    if isinstance(tgt, ast.Name):
                        self.defs[tgt.id] = node
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                self.defs[node.target.id] = node
        self._index_imports(tree.body)

    def _resolve_relative(self, level: int, module: str | None) -> str | None:
        # modules here are all top-level files in the package (or
        # subpackages like operators.*); level 1 = sibling of this file.
        parts = self.modname.split(".")
        if level >= len(parts):
            return None
        base = parts[: len(parts) - level]
        if module:
            base += module.split(".")
        return ".".join(base)

    def _index_imports(self, body) -> None:
        # Top-level imports only (descending into top-level If/Try for
        # TYPE_CHECKING / optional-dep guards, but NOT into function
        # bodies): following every lazy function-local import would make
        # the module closure transitively span the whole package — one
        # query module's fixture helper lazily importing another drags
        # in everything, and every gate goes stale on any edit anywhere.
        # Gate-local lazy imports are still collected per-gate by
        # _closure_signature's walk over the gate's own closure nodes.
        stack: list[ast.stmt] = list(body)
        while stack:
            node = stack.pop()
            if isinstance(node, ast.If):
                stack.extend(node.body)
                stack.extend(node.orelse)
            elif isinstance(node, ast.Try):
                stack.extend(node.body)
                stack.extend(node.orelse)
                stack.extend(node.finalbody)
                for handler in node.handlers:
                    stack.extend(handler.body)
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.startswith(_PKG):
                        self.imports[alias.asname or alias.name.split(".")[0]] = (
                            alias.name
                        )
            elif isinstance(node, ast.ImportFrom):
                mod = (
                    self._resolve_relative(node.level, node.module)
                    if node.level
                    else node.module
                )
                if not mod or not mod.startswith(_PKG):
                    continue
                for alias in node.names:
                    local = alias.asname or alias.name
                    # `from .operators import dedup` -> dedup is a module;
                    # `from .events_io import load_events` -> a member.
                    # Either way the dependency is the deepest module that
                    # exists as a file; member-vs-module is resolved later
                    # by _module_relpath probing.
                    self.imports[local] = f"{mod}.{alias.name}"


def _names_in(node: ast.AST) -> set[str]:
    out: set[str] = set()
    for sub in ast.walk(node):
        if isinstance(sub, ast.Name):
            out.add(sub.id)
        elif isinstance(sub, ast.Attribute):
            # catch module attribute roots like `dedup.minhash(...)`
            root = sub
            while isinstance(root, ast.Attribute):
                root = root.value
            if isinstance(root, ast.Name):
                out.add(root.id)
    return out


def _module_relpath(modname: str) -> str | None:
    """icegopher_spark.operators.dedup -> package-relative file path, or
    None if no such module file exists (e.g. the name was a member)."""
    parts = modname.split(".")[1:]  # drop package root
    if not parts:
        return None
    candidates = [
        Path(_PKG, *parts).with_suffix(".py"),
        Path(_PKG, *parts, "__init__.py"),
    ]
    for cand in candidates:
        if (_REPO / cand).exists():
            return str(cand)
    # member import: try the parent module
    if len(parts) > 1:
        return _module_relpath(".".join([_PKG] + parts[:-1]))
    return None


@lru_cache(maxsize=None)
def _module_import_closure(relpath: str, generation: int = 0) -> tuple[str, ...]:
    """Transitive icegopher_spark file closure of one module, computed
    from the CURRENT tree (the closure defines *what* to hash; the blob
    layer defines *which version* of it)."""
    seen: set[str] = set()
    stack = [relpath]
    while stack:
        rel = stack.pop()
        if rel in seen:
            continue
        seen.add(rel)
        tree = _parse(_fs_key(rel))
        if tree is None:
            continue
        modname = _PKG + "." + rel[len(_PKG) + 1 :].removesuffix(".py").removesuffix(
            "/__init__"
        ).replace("/", ".")
        idx = _ModuleIndex(tree, modname)
        for target in idx.imports.values():
            dep = _module_relpath(target)
            if dep and dep not in seen:
                stack.append(dep)
    return tuple(sorted(seen))


# Registry plumbing shared by every gate in a module. Expanding the
# closure through these makes ALL gates stale whenever the registration
# machinery is refactored (the r9 oracle-thunk change did exactly that)
# — pure noise, since the machinery is exercised by every adjudication
# anyway. The decorator Call itself (with its oracle argument) still
# contributes to the hash; only expansion THROUGH these names is cut.
_INFRA_NAMES = frozenset({"register", "Query", "QUERIES"})


def _is_module(modname: str) -> bool:
    """True iff modname maps directly to a package file (no parent
    fallback — `icegopher_spark.queries.load` is a member, not a
    module)."""
    parts = modname.split(".")[1:]
    if not parts:
        return False
    return (_REPO / Path(_PKG, *parts).with_suffix(".py")).exists() or (
        _REPO / Path(_PKG, *parts, "__init__.py")
    ).exists()


def _source_key(layer: tuple, relpath: str) -> tuple:
    """layer is ('fs', generation) or ('git', commit)."""
    if layer[0] == "fs":
        return _fs_key(relpath)
    return ("git", layer[1], relpath)


def _index_for(layer: tuple, modname: str) -> _ModuleIndex | None:
    rel = _module_relpath(modname)
    if rel is None:
        return None
    # cache key includes the source key (mtime for fs), so an edited
    # file re-indexes within a long-lived process
    return _index_built(_source_key(layer, rel), modname)


@lru_cache(maxsize=None)
def _index_built(source_key: tuple, modname: str) -> _ModuleIndex | None:
    tree = _parse(source_key)
    return _ModuleIndex(tree, modname) if tree is not None else None


@lru_cache(maxsize=None)
def _symbol_info(
    layer: tuple, modname: str, name: str
) -> tuple[str | None, tuple[str, ...], tuple[str, ...], tuple[tuple[str, str], ...]]:
    """(sha256 of ast dump | None, same-module refs, whole-file module
    deps, cross-module (module, symbol) edges) for one top-level symbol
    — memoized so shared helpers are analyzed once per layer, not once
    per gate."""
    idx = _index_for(layer, modname)
    if idx is None:
        return ("NOMODULE", (), (), ())
    node = idx.defs.get(name)
    if node is None:
        target = idx.imports.get(name)
        if target is None:
            return (None, (), (), ())
        if _is_module(target):
            return (None, (), (target,), ())
        tmod, tsym = target.rsplit(".", 1)
        if _is_module(tmod):
            return (None, (), (), ((tmod, tsym),))
        return (None, (), (tmod,), ())
    refs = tuple(sorted(r for r in _names_in(node) if r not in _INFRA_NAMES))
    file_deps: list[str] = []
    edges: list[tuple[str, str]] = []
    for sub in ast.walk(node):
        if isinstance(sub, ast.Import):
            for alias in sub.names:
                if alias.name.startswith(_PKG):
                    file_deps.append(alias.name)
        elif isinstance(sub, ast.ImportFrom):
            mod = (
                idx._resolve_relative(sub.level, sub.module)
                if sub.level
                else sub.module
            )
            if mod and mod.startswith(_PKG):
                for alias in sub.names:
                    target = f"{mod}.{alias.name}"
                    if _is_module(target):
                        file_deps.append(target)
                    elif _is_module(mod):
                        edges.append((mod, alias.name))
                    else:
                        file_deps.append(mod)
    dump = ast.dump(node, include_attributes=False)
    return (
        hashlib.sha256(dump.encode()).hexdigest(),
        refs,
        tuple(file_deps),
        tuple(edges),
    )


def _closure_signature(
    layer: tuple, root_module: str, root_name: str
) -> tuple[list[tuple[str, str, str]], set[str]]:
    """Cross-module symbol closure.

    Follows name references within a module AND `from X import symbol`
    edges into other package modules at per-symbol granularity — so a
    gate in analytics_queries.py that uses queries.py's `load` helper
    hashes `load`'s definition, not all 3000 lines of queries.py.
    Module-object imports (`from .operators import dedup`, `import
    icegopher_spark.delta`) stay whole-file deps: attribute access on a
    module object can reach anything in it.

    Returns (sorted (module, symbol, ast-dump) triples,
    module names needing whole-file hashing).
    """
    stack: list[tuple[str, str]] = [(root_module, root_name)]
    done: set[tuple[str, str]] = set()
    sig: list[tuple[str, str, str]] = []
    file_deps: set[str] = set()
    while stack:
        key = stack.pop()
        if key in done:
            continue
        done.add(key)
        modname, name = key
        dump, refs, mod_files, edges = _symbol_info(layer, modname, name)
        if dump == "NOMODULE":
            sig.append((modname, name, "NOMODULE"))
            continue
        if dump is not None:
            sig.append((modname, name, dump))
        for ref in refs:
            k = (modname, ref)
            if k not in done:
                stack.append(k)
        file_deps.update(mod_files)
        for k in edges:
            if k not in done:
                stack.append(k)
    sig.sort()
    return sig, file_deps


def _gate_hash_from_tree(
    modname: str,
    fn_name: str,
    layer: tuple,  # ('fs',) or ('git', commit)
    raw_text_of,  # relpath -> str | None (for whole-file dep hashing)
) -> str | None:
    root = _index_for(layer, modname)
    if root is None or fn_name not in root.defs:
        return None
    sig, mod_deps = _closure_signature(layer, modname, fn_name)
    generation = layer[1] if layer[0] == "fs" else 0
    dep_files: set[str] = set()
    for dep_mod in mod_deps:
        rel = _module_relpath(dep_mod)
        if rel:
            dep_files.update(_module_import_closure(rel, generation))
    dep_hashes = []
    for rel in sorted(dep_files):
        text = raw_text_of(rel)
        dep_hashes.append(
            (rel, hashlib.sha256(text.encode()).hexdigest() if text is not None else "ABSENT")
        )
    payload = json.dumps([sig, dep_hashes], sort_keys=False)
    return hashlib.sha256(payload.encode()).hexdigest()


# ---------------------------------------------------------------------------
# public surface


def _current_raw(relpath: str) -> str | None:
    try:
        return (_REPO / relpath).read_text()
    except OSError:
        return None


def current_gate_hash(module: str, fn_name: str) -> str | None:
    # cached via _current_hash_keyed so an edited tree (new generation)
    # recomputes instead of serving the pre-edit hash
    return _current_hash_keyed(module, fn_name, _fs_generation())


@lru_cache(maxsize=None)
def _current_hash_keyed(module: str, fn_name: str, generation: int) -> str | None:
    return _gate_hash_from_tree(module, fn_name, ("fs", generation), _current_raw)


@lru_cache(maxsize=None)
def adjudicated_gate_hash(module: str, fn_name: str, round_no: int) -> str | None:
    commit = _round_commit(round_no)
    if commit is None:
        return None
    return _gate_hash_from_tree(
        module,
        fn_name,
        ("git", commit),
        lambda r: _blob(commit, r),
    )


def stale_gates(
    fn_locations: dict[str, tuple[str, str]], latest_round: dict[str, int]
) -> set[str]:
    """Gates whose current source hash differs from the hash at their
    most recent driver adjudication.

    fn_locations: gate name -> (module name, function name)
    latest_round: gate name -> last round with a CORRECTNESS row (0 =
    never adjudicated; those are the caller's problem, not staleness).
    """
    stale: set[str] = set()
    for name, (module, fn_name) in fn_locations.items():
        rnd = latest_round.get(name, 0)
        if rnd <= 0:
            continue
        cur = current_gate_hash(module, fn_name)
        old = adjudicated_gate_hash(module, fn_name, rnd)
        if cur is None or old is None or cur != old:
            stale.add(name)
    return stale
