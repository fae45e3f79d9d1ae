"""Interactive / batch query console — the reference's QueryTool
analogue (tools/src/main/java/nl/inl/blacklab/tools/QueryTool.java).

A stateful session over one :class:`IndexReader`: run CQL queries,
page through hits, sort/group them, switch to docs / groups / colloc
views, inspect documents and snippets, all from a terminal. Batch
mode (``-f commands.txt``) mirrors the reference's performance-test
format (QueryTool.java:451-460): each query line prints elapsed
milliseconds and the hit count tab-separated, non-query commands are
echoed preceded by ``@``, ``#`` lines are comments and ``&&`` chains
commands so they are timed together.

Deviations (documented): the reference's ``sensitive on/off`` global
default is not supported — use per-term CQL ``%c`` flags; wordlist /
sleep / concfi (content-store concordances) are out of scope here
(``usecontent=orig`` lives on the HTTP surface instead).
"""
from __future__ import annotations

import time

import numpy as np

__all__ = ["QueryToolSession", "run_querytool"]

_HELP = """\
Commands:
  <CQL query>        run a query, e.g. "quick" [pos="NN"]
  next / n, prev / p, page <n>   page through results
  pagesize <n>       results per page
  context <n>        context words around hits
  filter <expr>      metadata filter (e.g. lang:en); 'filter' clears
  sort <crit>        sort hits (word, left, right, doc, field:<f>, ...)
  group <crit>       group hits; 'group <n>' views group n
  hits / groups / docs / colloc   switch result view
  snippet <n>        show hit n with more context
  snippetsize <n>    context size for 'snippet'
  doc <n>            show document metadata
  struct             show index structure
  clear              clear query and results
  help / ?           this help
  exit / quit        leave"""

# reference sort/group shorthands → this server's criterion grammar
_CRIT_ALIASES = {
    "word": "hit:word:i", "hit": "hit:word:i",
    "match": "hit:word:i",
    "left": "left:word:i", "right": "right:word:i",
    "wordleft": "wordleft:word:i", "wordright": "wordright:word:i",
    "doc": "doc", "docid": "docid",
}


def _crit(spec: str) -> str:
    return _CRIT_ALIASES.get(spec.strip(), spec.strip())


class QueryToolSession:
    """One console session: current hits, view mode, paging state."""

    def __init__(self, reader):
        self.reader = reader
        self.pagesize = 20
        self.context = 5
        self.snippetsize = 50
        self.filter_expr: str | None = None
        self.spans = None            # pyarrow span table of last query
        self.groups: list | None = None   # [(identity, size)] ordered
        self.group_keys: list | None = None  # per-hit group key
        self.view = "hits"
        self.page = 0
        self.last_patt: str | None = None

    # -- command entry ---------------------------------------------------

    def execute(self, line: str) -> tuple[list[str], bool]:
        """Run one command; returns (output lines, was_query)."""
        cmd = line.strip()
        if not cmd or cmd.startswith("#"):
            return [], False
        low = cmd.lower()
        if low in ("help", "?"):
            return _HELP.splitlines(), False
        if low in ("clear", "reset"):
            self.spans = self.groups = self.group_keys = None
            self.view, self.page = "hits", 0
            return ["Query and results cleared."], False
        if low in ("next", "n"):
            self.page += 1
            return self._show(), False
        if low in ("prev", "p"):
            self.page = max(0, self.page - 1)
            return self._show(), False
        if low.startswith("page "):
            self.page = max(0, int(low[5:]) - 1)
            return self._show(), False
        if low.startswith("pagesize "):
            self.pagesize = max(1, int(low[9:]))
            self.page = 0
            return self._show(), False
        if low.startswith("context "):
            self.context = max(0, int(low[8:]))
            return self._show(), False
        if low.startswith("snippetsize "):
            self.snippetsize = max(1, int(low[12:]))
            return [f"Snippets will show {self.snippetsize} words "
                    f"of context."], False
        if low.startswith("snippet "):
            return self._snippet(int(low[8:]) - 1), False
        if low == "filter":
            self.filter_expr = None
            return ["Filter cleared."], False
        if low.startswith("filter "):
            self.filter_expr = cmd[7:].strip()
            return [f"Filter set: {self.filter_expr}"], False
        if low.startswith("doc "):
            return self._doc_meta(int(low[4:])), False
        if low in ("struct", "structure"):
            return self._struct(), False
        if low.startswith("sort by "):
            return self._sort(cmd[8:]), False
        if low.startswith("sort "):
            return self._sort(cmd[5:]), False
        if low.startswith("group by "):
            return self._group(cmd[9:]), False
        if low.startswith("group "):
            arg = cmd[6:].strip()
            if arg.isdigit():
                return self._enter_group(int(arg) - 1), False
            return self._group(arg), False
        if low in ("hits", "docs", "groups") or low.startswith("colloc"):
            if low.startswith("colloc"):
                low = "colloc"
            self.view, self.page = low, 0
            return self._show(), False
        if low.startswith("sensitive "):
            return ["Global sensitivity is not supported here; use "
                    "per-term CQL %c flags."], False
        # anything else is a query
        return self._query(cmd), True

    # -- query + views ---------------------------------------------------

    def _query(self, patt: str) -> list[str]:
        from blacklab_ray.server import _spans_table_for
        self.spans, _ = _spans_table_for(self.reader, patt,
                                      self.filter_expr)
        self.last_patt = patt
        self.groups = self.group_keys = None
        self.view, self.page = "hits", 0
        return self._show()

    def _show(self) -> list[str]:
        if self.spans is None:
            return ["No query active. Type 'help' for help."]
        if self.view == "groups":
            return self._show_groups()
        if self.view == "docs":
            return self._show_docs()
        if self.view == "colloc":
            return self._show_colloc()
        return self._show_hits()

    def _window(self):
        lo = self.page * self.pagesize
        return lo, min(lo + self.pagesize, self.spans.num_rows)

    def _show_hits(self) -> list[str]:
        from blacklab_ray.server import _context
        n = self.spans.num_rows
        lo, hi = self._window()
        d = self.spans["doc_id"].to_numpy()[lo:hi]
        s = self.spans["start"].to_numpy()[lo:hi]
        e = self.spans["end"].to_numpy()[lo:hi]
        urls = self.reader.urls(d)
        ctx = _context(self.reader, d, s, e, self.context)
        out = []
        for u, (L, M, R) in zip(urls, ctx):
            out.append(f"[{u}] {' '.join(L['word'])} "
                       f"[{' '.join(M['word'])}] "
                       f"{' '.join(R['word'])}".strip())
        n_docs = int(np.unique(self.spans["doc_id"].to_numpy()).size)
        out.append(f"{n} hits in {n_docs} documents "
                   f"(showing {lo + 1}-{hi})")
        return out

    def _show_docs(self) -> list[str]:
        d = self.spans["doc_id"].to_numpy()
        uniq, counts = np.unique(d, return_counts=True)
        order = np.argsort(-counts, kind="stable")
        uniq, counts = uniq[order], counts[order]
        lo = self.page * self.pagesize
        hi = min(lo + self.pagesize, uniq.size)
        urls = self.reader.urls(uniq[lo:hi])
        out = [f"{u}: {int(c)} hits"
               for u, c in zip(urls, counts[lo:hi])]
        out.append(f"{uniq.size} documents (showing {lo + 1}-{hi})")
        return out

    def _group(self, spec: str) -> list[str]:
        if self.spans is None:
            return ["No query active."]
        from blacklab_ray.server import _group_keys
        keys, _prop = _group_keys(self.reader, self.spans,
                                  _crit(spec), n_ctx=self.context)
        sizes: dict[str, int] = {}
        for k in keys:
            sizes[k] = sizes.get(k, 0) + 1
        self.group_keys = keys
        self.groups = sorted(sizes.items(),
                             key=lambda kv: (-kv[1], kv[0]))
        self.view, self.page = "groups", 0
        return self._show_groups()

    def _show_groups(self) -> list[str]:
        if not self.groups:
            return ["No grouping active (use 'group <criterion>')."]
        lo = self.page * self.pagesize
        hi = min(lo + self.pagesize, len(self.groups))
        out = [f"{i + 1}. {k} ({n})"
               for i, (k, n) in enumerate(self.groups[lo:hi], lo)]
        out.append(f"{len(self.groups)} groups "
                   f"(showing {lo + 1}-{hi})")
        return out

    def _enter_group(self, idx: int) -> list[str]:
        if not self.groups or not (0 <= idx < len(self.groups)):
            return ["Group number out of range."]
        import pyarrow as pa
        want = self.groups[idx][0]
        sel = np.array([k == want for k in self.group_keys],
                       dtype=bool)
        self.spans = self.spans.take(
            pa.array(np.flatnonzero(sel), pa.int64()))
        self.groups = self.group_keys = None
        self.view, self.page = "hits", 0
        return [f"Viewing group: {want}"] + self._show_hits()

    def _show_colloc(self) -> list[str]:
        from blacklab_ray.server import _colloc_counts
        d = self.spans["doc_id"].to_numpy()
        s = self.spans["start"].to_numpy()
        e = self.spans["end"].to_numpy()
        tf = _colloc_counts(self.reader, d, s, e, self.context)
        items = list(tf.items())
        lo = self.page * self.pagesize
        hi = min(lo + self.pagesize, len(items))
        out = [f"{w}: {n}" for w, n in items[lo:hi]]
        out.append(f"{len(items)} collocations "
                   f"(showing {lo + 1}-{hi})")
        return out

    def _sort(self, spec: str) -> list[str]:
        if self.spans is None:
            return ["No query active."]
        import pyarrow as pa

        from blacklab_ray.analysis.collate import key_for_context
        from blacklab_ray.server import _group_keys, _is_numeric_crit
        keys, _prop = _group_keys(self.reader, self.spans,
                                  _crit(spec), n_ctx=self.context)
        if _is_numeric_crit(_crit(spec)):
            ck: list = [int(k) for k in keys]
        else:
            ck = [key_for_context(k, sensitive=False) for k in keys]
        order = sorted(range(len(ck)), key=lambda i: ck[i])
        self.spans = self.spans.take(pa.array(order, pa.int64()))
        # per-hit group keys were computed in the OLD span order
        self.groups = self.group_keys = None
        self.page = 0
        self.view = "hits"
        return self._show_hits()

    # -- inspection ------------------------------------------------------

    def _snippet(self, idx: int) -> list[str]:
        if self.spans is None or not (0 <= idx < self.spans.num_rows):
            return ["Hit number out of range."]
        from blacklab_ray.server import _context
        d = self.spans["doc_id"].to_numpy()[idx:idx + 1]
        s = self.spans["start"].to_numpy()[idx:idx + 1]
        e = self.spans["end"].to_numpy()[idx:idx + 1]
        (L, M, R), = _context(self.reader, d, s, e, self.snippetsize)
        return [f"{' '.join(L['word'])} [{' '.join(M['word'])}] "
                f"{' '.join(R['word'])}".strip()]

    def _doc_meta(self, doc_id: int) -> list[str]:
        from blacklab_ray.server import _doc_infos
        ids = np.array([doc_id], np.int64)
        infos = _doc_infos(self.reader, ids)
        if not infos:
            return [f"Document {doc_id} not found."]
        (pid, info), = infos.items()
        out = [f"doc {doc_id} (pid {pid}):"]
        for k, v in info.items():
            out.append(f"  {k}: {v[0] if isinstance(v, list) else v}")
        return out

    def _struct(self) -> list[str]:
        from blacklab_ray.server import handle_info
        info = handle_info(self.reader)
        out = [f"index: {info['indexName']}",
               f"documents: {info['documentCount']}",
               f"tokens: {info['tokenCount']}",
               "metadata fields:"]
        for f, spec in info["metadataFields"].items():
            out.append(f"  {f} ({spec['type']})")
        return out


def run_querytool(index_dir: str, commands=None, out=None,
                  batch: bool = False) -> int:
    """Drive a session. ``commands`` is an iterable of lines (batch
    file or scripted test); None reads stdin interactively. In batch
    mode each query line prints ``<ms>\\t<hits>\\t<line>`` and other
    commands echo as ``@<line>`` (QueryTool.java:451-460)."""
    import sys

    from blacklab_ray.query import IndexReader
    emit = out if out is not None else \
        (lambda s: print(s, file=sys.stdout))
    sess = QueryToolSession(IndexReader(index_dir))
    if commands is None:
        commands = iter(sys.stdin.readline, "")
        emit("BlackLab-Ray QueryTool. Type 'help' for help, "
             "'exit' to quit.")
    for raw in commands:
        line = raw.rstrip("\n")
        if line.strip().lower() in ("exit", "quit"):
            break
        # '&&' chains commands so batch mode times them together
        parts = [p.strip() for p in line.split("&&")] \
            if "&&" in line else [line]
        t0 = time.perf_counter()
        lines: list[str] = []
        any_query = False
        for p in parts:
            try:
                ls, was_query = sess.execute(p)
            except Exception as exc:      # console: report, don't die
                ls, was_query = [f"Error: {exc}"], False
            lines.extend(ls)
            any_query = any_query or was_query
        ms = (time.perf_counter() - t0) * 1000.0
        if batch:
            if any_query:
                n = sess.spans.num_rows if sess.spans is not None \
                    else 0
                emit(f"{ms:.1f}\t{n}\t{line}")
            elif line.strip() and not line.strip().startswith("#"):
                emit(f"@{line}")
        else:
            for ln in lines:
                emit(ln)
    return 0
