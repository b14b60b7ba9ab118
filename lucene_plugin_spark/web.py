"""Thin HTTP demo facade over :class:`LuceneFacade` — the Spark-side
mirror of the reference's web surface (LuceneFacadeImpl.java:23-151:
``@Path("/lucene")`` with POST /index-file /index-text /index-map /delete
/clear and GET /search; JSON bodies/results as the JS client
``lucene-client.js`` sends them).

stdlib ``http.server`` only — a demo endpoint, not a production server: a
real deployment of this engine calls the Python API directly (the facade
is the service; HTTP here is a transport shim).  Requests are serialized
through the facade exactly as Baratine serialized them through the
single-writer service mailbox (C1) — ThreadingHTTPServer handles sockets
concurrently but every handler funnels into one facade guarded by a lock.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def make_server(facade, host: str = "127.0.0.1", port: int = 0):
    """Build (not start) a ThreadingHTTPServer bound to the facade.

    ``port=0`` binds an ephemeral port (read it from
    ``server.server_address[1]``).  Start with
    ``threading.Thread(target=server.serve_forever, daemon=True).start()``.
    """
    lock = threading.Lock()  # single-writer serialization (C1)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test output
            pass

        def _reply(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(n) if n else b"{}"
            return json.loads(raw or b"{}")

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            try:
                if u.path == "/lucene/search":
                    with lock:
                        offset = int(q.get("offset", 0))
                        if offset > 0:  # deep paging (our extension)
                            hits = facade.search_page(
                                q.get("collection", ""), q.get("query", ""),
                                int(q.get("limit", 255)), offset)
                        else:
                            hits = facade.search(q.get("collection", ""),
                                                 q.get("query", ""),
                                                 int(q.get("limit", 255)))
                    # LuceneEntry list -> the reference's JSON result shape
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                # module-family extensions beyond the reference's six routes
                elif u.path == "/lucene/suggest":
                    with lock:
                        out = facade.suggest(q.get("prefix", ""),
                                             int(q.get("limit", 10)))
                    self._reply(200, [{"term": t, "cf": c} for t, c in out])
                elif u.path == "/lucene/search-surround":
                    with lock:
                        hits = facade.search_surround(
                            q.get("collection", ""), q.get("query", ""),
                            int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/passages":
                    terms = [t for t in q.get("terms", "").split(",") if t]
                    with lock:
                        self._reply(200, facade.search_passages(
                            q.get("collection", ""), terms,
                            int(q.get("width", 16)),
                            int(q.get("limit", 10))))
                elif u.path == "/lucene/drill-sideways":
                    drill = dict(kv.split(":", 1) for kv in
                                 q.get("drill", "").split(",") if ":" in kv)
                    facets = [f for f in q.get("facets", "").split(",") if f]
                    with lock:
                        self._reply(200, facade.drill_sideways(
                            q.get("collection", ""), q.get("query", ""),
                            drill, facets))
                elif u.path == "/lucene/suggest-infix":
                    with lock:
                        out = facade.suggest_infix(q.get("substring", ""),
                                                   int(q.get("limit", 10)))
                    self._reply(200, [{"term": t, "cf": c} for t, c in out])
                elif u.path == "/lucene/spellcheck":
                    terms = [t for t in q.get("terms", "").split(",") if t]
                    with lock:
                        self._reply(200, facade.spellcheck(terms))
                elif u.path == "/lucene/highlight":
                    with lock:
                        self._reply(200, facade.highlight(
                            q.get("collection", ""), q.get("term", ""),
                            int(q.get("limit", 10)),
                            int(q.get("window", 40))))
                elif u.path == "/lucene/span-near":
                    terms = [t for t in q.get("terms", "").split(",") if t]
                    with lock:
                        hits = facade.span_near(
                            q.get("collection", ""), terms,
                            int(q.get("slop", 2)),
                            q.get("inOrder", "false") == "true",
                            int(q.get("limit", 10)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-min-match":
                    with lock:
                        hits = facade.search_min_match(
                            q.get("collection", ""), q.get("query", ""),
                            int(q.get("minShouldMatch", 1)),
                            int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-filtered":
                    with lock:
                        hits = facade.search_filtered(
                            q.get("collection", ""), q.get("query", ""),
                            q.get("filter", ""), int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-dismax":
                    djs = [s for s in q.get("queries", "").split(",") if s]
                    with lock:
                        hits = facade.search_dismax(
                            q.get("collection", ""), djs,
                            float(q.get("tie", 0.0)),
                            int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-multi-field":
                    flds = [f for f in q.get("fields", "").split(",") if f]
                    boosts = {}
                    for kv in q.get("boosts", "").split(","):
                        if ":" in kv:
                            k, v = kv.split(":", 1)
                            boosts[k] = float(v)
                    with lock:
                        hits = facade.search_multi_field(
                            q.get("collection", ""), q.get("query", ""),
                            flds, boosts or None,
                            int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-sorted":
                    with lock:
                        self._reply(200, facade.search_sorted(
                            q.get("collection", ""), q.get("query", ""),
                            q.get("sortField", "path"),
                            int(q.get("limit", 10)),
                            q.get("ascending", "true") == "true"))
                elif u.path == "/lucene/search-rescore":
                    with lock:
                        hits = facade.search_rescore(
                            q.get("collection", ""), q.get("query", ""),
                            q.get("rescoreQuery", ""),
                            int(q.get("window", 50)),
                            float(q.get("weight", 2.0)),
                            int(q.get("limit", 10)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-constant-score":
                    with lock:
                        hits = facade.search_constant_score(
                            q.get("collection", ""), q.get("query", ""),
                            float(q.get("boost", 1.0)),
                            int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-function-score":
                    with lock:
                        hits = facade.search_function_score(
                            q.get("collection", ""), q.get("query", ""),
                            float(q.get("weight", 0.1)),
                            int(q.get("limit", 10)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-tfidf":
                    terms = [t for t in q.get("terms", "").split(",") if t]
                    with lock:
                        hits = facade.search_tfidf(
                            q.get("collection", ""), terms,
                            int(q.get("limit", 10)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-lm":
                    terms = [t for t in q.get("terms", "").split(",") if t]
                    param = q.get("param")
                    with lock:
                        hits = facade.search_lm(
                            q.get("collection", ""), terms,
                            q.get("similarity", "dirichlet"),
                            None if param is None else float(param),
                            int(q.get("limit", 10)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-dfr":
                    terms = [t for t in q.get("terms", "").split(",") if t]
                    with lock:
                        hits = facade.search_dfr(
                            q.get("collection", ""), terms,
                            float(q.get("c", 1.0)), int(q.get("limit", 10)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-ib":
                    terms = [t for t in q.get("terms", "").split(",") if t]
                    with lock:
                        hits = facade.search_ib(
                            q.get("collection", ""), terms,
                            float(q.get("c", 1.0)), int(q.get("limit", 10)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-multi-phrase":
                    slots = [s.split("|") for s in
                             q.get("slots", "").split(",") if s]
                    with lock:
                        hits = facade.search_multi_phrase(
                            q.get("collection", ""), slots,
                            int(q.get("slop", 0)), int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-phonetic":
                    with lock:
                        hits = facade.search_phonetic(
                            q.get("collection", ""), q.get("term", ""),
                            int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-sweetspot":
                    terms = [t for t in q.get("terms", "").split(",") if t]
                    with lock:
                        hits = facade.search_sweetspot(
                            q.get("collection", ""), terms,
                            int(q.get("min", 8)), int(q.get("max", 32)),
                            float(q.get("steepness", 0.5)),
                            int(q.get("limit", 10)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-span-first":
                    with lock:
                        hits = facade.search_span_first(
                            q.get("collection", ""), q.get("term", ""),
                            int(q.get("end", 5)), int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-expression":
                    with lock:
                        hits = facade.search_expression(
                            q.get("collection", ""), q.get("query", ""),
                            q.get("expr", "_score"),
                            int(q.get("limit", 10)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-simple":
                    with lock:
                        hits = facade.search_simple(
                            q.get("collection", ""), q.get("query", ""),
                            default_operator=q.get("op", "should"),
                            limit=int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-span-range":
                    with lock:
                        hits = facade.search_span_range(
                            q.get("collection", ""), q.get("term", ""),
                            int(q.get("start", 0)), int(q.get("end", 5)),
                            int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-terms-set":
                    terms = [t for t in q.get("terms", "").split(",") if t]
                    with lock:
                        hits = facade.search_terms_set(
                            q.get("collection", ""), terms,
                            float(q.get("boost", 1.0)),
                            int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-phrase-prefix":
                    terms = [t for t in q.get("terms", "").split(",") if t]
                    with lock:
                        hits = facade.search_phrase_prefix(
                            q.get("collection", ""), terms,
                            q.get("prefix", ""),
                            int(q.get("maxExpansions", 50)),
                            int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-complex-phrase":
                    slots = [s for s in q.get("slots", "").split(",") if s]
                    with lock:
                        hits = facade.search_complex_phrase(
                            q.get("collection", ""), slots,
                            int(q.get("slop", 0)),
                            int(q.get("maxExpansions", 50)),
                            int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-common-terms":
                    terms = [t for t in q.get("terms", "").split(",") if t]
                    with lock:
                        hits = facade.search_common_terms(
                            q.get("collection", ""), terms,
                            float(q.get("maxTermFrequency", 0.01)),
                            int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-boosting":
                    with lock:
                        hits = facade.search_boosting(
                            q.get("collection", ""), q.get("query", ""),
                            q.get("negativeQuery", ""),
                            float(q.get("negativeBoost", 0.2)),
                            int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path in ("/lucene/search-span-containing",
                                "/lucene/search-span-within"):
                    big = [t for t in q.get("big", "").split(",") if t]
                    fn = (facade.search_span_containing
                          if u.path.endswith("containing")
                          else facade.search_span_within)
                    with lock:
                        hits = fn(q.get("collection", ""), big,
                                  q.get("little", ""),
                                  int(q.get("slop", 2)),
                                  int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                elif u.path == "/lucene/search-join":
                    with lock:
                        hits = facade.search_join(
                            q.get("collection", ""), q.get("fromQuery", ""),
                            q.get("fromField", ""),
                            q.get("toField") or None,
                            q.get("scoreMode", "max"),
                            int(q.get("limit", 255)))
                    self._reply(200, [{"id": h.id, "score": h.score,
                                       "externalId": h.external_id}
                                      for h in hits])
                else:
                    self._reply(404, {"error": f"no route {u.path}"})
            except Exception as e:  # LuceneException analogue -> 400
                self._reply(400, {"error": str(e)})

        def do_POST(self) -> None:  # noqa: N802
            u = urlparse(self.path)
            routes = {
                "/lucene/index-text": lambda b: facade.index_text(
                    b.get("collection", ""), b.get("id", ""), b.get("text")),
                "/lucene/index-map": lambda b: facade.index_map(
                    b.get("collection", ""), b.get("id", ""), b.get("map")),
                "/lucene/index-file": lambda b: facade.index_file(
                    b.get("collection", ""), b.get("path", "")),
                "/lucene/delete": lambda b: facade.delete(
                    b.get("collection", ""), b.get("id", "")),
                "/lucene/clear": lambda b: facade.clear(
                    b.get("collection", "")),
                # synonyms need a JSON map payload -> POST
                "/lucene/search-synonyms": lambda b: [
                    {"id": h.id, "score": h.score,
                     "externalId": h.external_id}
                    for h in facade.search_synonyms(
                        b.get("collection", ""), b.get("query", ""),
                        b.get("synonyms") or {},
                        int(b.get("limit", 255)))],
            }
            fn = routes.get(u.path)
            if fn is None:
                self._reply(404, {"error": f"no route {u.path}"})
                return
            try:
                body = self._body()
                with lock:
                    out = fn(body)
                if isinstance(out, list):  # search-shaped POST routes
                    self._reply(200, out)
                else:
                    self._reply(200, bool(out) if out is not None else True)
            except Exception as e:
                self._reply(400, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)
