"""P1 — aggressive URL canonicalization as pure Column algebra.

The reference canonicalizes on BOTH paths with OpenWayback's
AggressiveUrlCanonicalizer: write side IndexBuilder.java:57,194-199, read
side DeDuplicator.java:120,158 (dep deduplicator-commons/pom.xml:36-40).
Re-expressed as a deterministic regexp_replace chain (no Python, no UDF —
whole-stage codegen end to end), implementing the canonicalizer's documented
core rules:

  * lowercase the whole URL
  * strip the fragment
  * strip userinfo (user:pass@)
  * strip session-id path parameters (;jsessionid=...)
  * strip session-id query parameters (jsessionid, phpsessid, sid,
    sessionid, cfid, cftoken, aspsessionid*)
  * strip a leading www / www<digits> host label
  * strip default ports (:80 for http, :443 for https)
  * strip trailing slashes and a dangling '?'

Not implemented (documented delta vs the reference dependency): query-arg
re-ordering and IP/hex-host normalization — rules that need tokenization,
not string algebra; they affect none of the planted fixtures.

ONE rule table drives both engines: `canonicalize_url` builds the Spark
Column chain ($1 backrefs), `canonicalize_sql` renders the identical chain
as nested DuckDB regexp_replace calls (\\1 backrefs, 'g' flag) so the
driver's oracle and the Spark plan can never drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SESSION_PARAMS = r"(?:jsessionid|phpsessid|aspsessionid[a-z0-9]*|sessionid|sid|cfid|cftoken)"

# (pattern, replacement-template) — template uses {1},{2} for group refs;
# applied in order to the lowercased URL. The session-query rule appears
# twice: one global pass cannot re-match at the boundary it just rewrote
# (…?sid=1&sid=2&… needs a second pass).
_RULES: tuple[tuple[str, str], ...] = (
    (r"#.*$", ""),                                       # fragment
    (r"^(https?://)[^/@]*@", "{g1}"),                     # userinfo
    (r";" + _SESSION_PARAMS + r"=[^?#&]*", ""),          # path session param
    (r"([?&])" + _SESSION_PARAMS + r"=[^&]*&", "{g1}"),   # query session (mid)
    (r"([?&])" + _SESSION_PARAMS + r"=[^&]*&", "{g1}"),   # second pass (adjacent)
    (r"[?&]" + _SESSION_PARAMS + r"=[^&]*$", ""),        # query session (tail)
    (r"^(https?://)www\d*\.", "{g1}"),                    # www host label
    (r"^(http://[^/:]+):80(/|$)", "{g1}{g2}"),             # default http port
    (r"^(https://[^/:]+):443(/|$)", "{g1}{g2}"),           # default https port
    (r"\?$", ""),                                        # dangling '?'
    (r"([^/])/+$", "{g1}"),                               # trailing slashes
)


def canonicalize_url(url: Column) -> Column:
    """Spark Column chain (P1). Injectable wherever a canonicalizer is
    taken as a parameter (U5 — the reference hardcodes its canonicalizer
    with a TODO to make it pluggable, DeDuplicator.java:119-120)."""
    out = F.lower(url)
    for pat, repl in _RULES:
        out = F.regexp_replace(out, pat, repl.format(g1="$1", g2="$2"))
    return out


def canonicalize_sql(expr: str) -> str:
    """The identical chain as a DuckDB SQL expression over ``expr``."""
    out = f"lower({expr})"
    for pat, repl in _RULES:
        sql_repl = repl.format(g1=r"\1", g2=r"\2")
        pat_sql = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{pat_sql}', '{sql_repl}', 'g')"
    return out
