"""Registry-diff-driven query subsetting for mid-round certification
cadence (VERDICT r6 item 8): map ``git diff --name-only <rev>`` to
the set of registered queries whose behavior could have changed, so
``check_oracle --changed-since <rev>`` re-verifies minutes of work in
seconds. STATIC analysis only — AST and text, nothing executed from
the old revision.

Scoping rules (conservative by construction):
- ``queries.py`` changed → per-query BLOCK diff: a query is affected
  iff the source segment of its ``def qNNN_...`` (including the
  ``@_q`` decorator, i.e. the oracle SQL) differs between revisions,
  or it is new. Queries whose blocks are byte-identical are not.
- a package module changed (``operators/*``, ``functions/*``,
  ``streaming/*``, ``tokenizer`` …) → every query whose function
  source references that module — or any module that TRANSITIVELY
  imports it — is affected. References are found in the query fn's
  source via the package-import aliases of ``queries.py`` (``DD.`` →
  operators.dedup) and function-level ``from … import`` lines.
- INFRA changed (``session.py``, ``sources/``, ``schema.py``,
  ``plans/``, ``__spark_entry__.py``) → cannot scope: full run.
- anything outside the package (tests, tools, docs) → affects no
  queries.

The FULL gate remains mandatory at round end (tools/certify.py
without ``--changed-since``); this subset exists so the full run's
cost cannot rot the mid-round habit of checking before committing.
"""

from __future__ import annotations

import ast
import re
import subprocess
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = "dataflow_python_etl_spark"
QUERIES_PY = f"{PKG}/queries.py"

# paths whose change means "anything could differ" — the table reader,
# the session conf, the schema contract, the plan helpers
_INFRA = (
    f"{PKG}/session.py",
    f"{PKG}/schema.py",
    f"{PKG}/sources/",
    f"{PKG}/plans/",
    f"{PKG}/resources/",
    "__spark_entry__.py",
)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, check=True, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    ).stdout


def changed_files(rev: str) -> list[str]:
    """Paths changed between ``rev`` and the working tree (staged,
    unstaged, and committed-after-rev alike)."""
    return sorted(
        {ln.strip() for ln in _git("diff", "--name-only", rev).splitlines() if ln.strip()}
    )


def _module_of(path: str) -> str | None:
    """'dataflow_python_etl_spark/operators/dedup.py' → 'operators.dedup'."""
    if not path.startswith(PKG + "/") or not path.endswith(".py"):
        return None
    rel = path[len(PKG) + 1 : -3]
    return rel.replace("/", ".")


def _package_import_graph() -> dict[str, set[str]]:
    """module → set of package modules it imports (one AST pass per
    file; used to propagate 'dedup changed' to corpus, upsert, …)."""
    graph: dict[str, set[str]] = {}
    for py in (ROOT / PKG).rglob("*.py"):
        mod = _module_of(str(py.relative_to(ROOT)))
        if mod is None:
            continue
        deps: set[str] = set()
        tree = ast.parse(py.read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module:
                m = node.module
                if m.startswith(PKG + "."):
                    deps.add(m[len(PKG) + 1 :])
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.startswith(PKG + "."):
                        deps.add(alias.name[len(PKG) + 1 :])
        graph[mod] = deps
    return graph


def _dirty_modules(seed: set[str]) -> set[str]:
    """Transitive closure: every module importing a dirty module is
    dirty too (fixed point over the reversed import graph)."""
    graph = _package_import_graph()
    dirty = set(seed)
    while True:
        grew = {
            m for m, deps in graph.items()
            if m not in dirty and deps & dirty
        }
        if not grew:
            return dirty
        dirty |= grew


def _query_blocks(source: str) -> dict[str, str]:
    """Query name → exact source segment of its decorated def (the
    ``@_q("qNNN_…", oracle, doc)`` call plus the function body)."""
    tree = ast.parse(source)
    blocks: dict[str, str] = {}
    for node in tree.body:
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        name = None
        for dec in node.decorator_list:
            if (
                isinstance(dec, ast.Call)
                and dec.args
                and isinstance(dec.args[0], ast.Constant)
                and isinstance(dec.args[0].value, str)
                and dec.args[0].value.startswith("q")
            ):
                name = dec.args[0].value
        if name is None:
            continue
        start = min(
            [node.lineno] + [d.lineno for d in node.decorator_list]
        )
        seg = "\n".join(source.splitlines()[start - 1 : node.end_lineno])
        blocks[name] = seg
    return blocks


def _query_module_refs() -> dict[str, set[str]]:
    """Query name → package modules its block references, via (a) the
    top-level import aliases of queries.py (``DD`` → operators.dedup)
    and (b) function-level ``from PKG.x.y import`` lines inside the
    block."""
    source = (ROOT / QUERIES_PY).read_text()
    tree = ast.parse(source)
    aliases: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, ast.ImportFrom) and node.module:
            m = node.module
            if m.startswith(PKG + ".") or m == PKG:
                short = m[len(PKG) + 1 :] if m != PKG else ""
                for alias in node.names:
                    nm = alias.asname or alias.name
                    # `from PKG.operators import dedup as DD` → module
                    # operators.dedup; `from PKG.functions.core import
                    # age_years` → module functions.core
                    target = f"{short}.{alias.name}" if alias.name[0].islower() else short
                    full = target if short else alias.name
                    # resolve: does PKG/<full>.py exist? else the import
                    # was a symbol from the module `short`
                    if not (ROOT / PKG / (full.replace(".", "/") + ".py")).exists():
                        full = short
                    if full:
                        aliases[nm] = full
    refs: dict[str, set[str]] = {}
    for name, block in _query_blocks(source).items():
        mods: set[str] = set()
        for nm, mod in aliases.items():
            if re.search(rf"\b{re.escape(nm)}\b", block):
                mods.add(mod)
        for m in re.findall(rf"from {PKG}\.([\w.]+) import", block):
            mods.add(m)
        for m in re.findall(rf"{PKG}\.([\w.]+)", block):
            mods.add(m)
        # `from PKG.operators import graph` / `import multimodal as MM`
        # style inside the block (including multiline parenthesized
        # lists); over-capture is harmless — pieces must name a real
        # module file to count, and over-INCLUSION only widens the
        # scoped run (conservative direction)
        for pkgdir, leaf in re.findall(
            rf"from {PKG}\.(\w+) import \(?([\w,\n ]+)", block
        ):
            for piece in leaf.split(","):
                piece = piece.split(" as ")[0].strip()
                if piece and (ROOT / PKG / pkgdir / (piece + ".py")).exists():
                    mods.add(f"{pkgdir}.{piece}")
        refs[name] = mods
    return refs


def _residue(source: str) -> str:
    """``queries.py`` with every query block removed — the shared
    module-level surface (imports, _NGRAM_*_CTES constants, _t/TODAY
    helpers) that any oracle f-string may reference. If THIS differs
    between revisions, block-level diffing cannot scope the change."""
    lines = source.splitlines()
    drop = [False] * len(lines)
    tree = ast.parse(source)
    for node in tree.body:
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        if not any(
            isinstance(d, ast.Call)
            and d.args
            and isinstance(d.args[0], ast.Constant)
            and isinstance(d.args[0].value, str)
            and d.args[0].value.startswith("q")
            for d in node.decorator_list
        ):
            continue
        start = min([node.lineno] + [d.lineno for d in node.decorator_list])
        for i in range(start - 1, node.end_lineno):
            drop[i] = True
    return "\n".join(ln for ln, d in zip(lines, drop) if not d)


def queries_affected_since(rev: str) -> set[str] | None:
    """The subset of registered query names whose behavior could have
    changed since ``rev``; ``None`` means "cannot scope — run the
    full gate" (infra changed)."""
    files = changed_files(rev)
    affected: set[str] = set()
    dirty_seed: set[str] = set()
    for f in files:
        if any(f.startswith(p) or f == p.rstrip("/") for p in _INFRA):
            return None
        if f == QUERIES_PY:
            old = _git("show", f"{rev}:{QUERIES_PY}")
            new = (ROOT / QUERIES_PY).read_text()
            if _residue(old) != _residue(new):
                # module-level state changed (shared CTE constants,
                # helper fns the oracle f-strings close over) — block
                # diffs can't see which oracles that rewrote: full run
                return None
            ob, nb = _query_blocks(old), _query_blocks(new)
            affected |= {q for q, seg in nb.items() if ob.get(q) != seg}
            continue
        mod = _module_of(f)
        if mod is not None:
            dirty_seed.add(mod)
    if dirty_seed:
        dirty = _dirty_modules(dirty_seed)
        if "queries" in dirty or "sources.catalog" in dirty:
            # queries.py references everything; catalog feeds every read
            dirty.discard("queries")
        refs = _query_module_refs()
        affected |= {q for q, mods in refs.items() if mods & dirty}
    return affected


if __name__ == "__main__":
    import sys

    got = queries_affected_since(sys.argv[1] if len(sys.argv) > 1 else "HEAD")
    print("FULL RUN (infra changed)" if got is None else "\n".join(sorted(got)) or "(none)")
