"""ES search templates: stored, parameterized query bodies.

ES stores a mustache-source template and renders it with ``params`` at
search time; deployments use them to pin query shapes server-side while
clients pass only values.  Monstache-fed clusters rely on them for the
read path (the reference's docs point users at stored searches over the
synced indexes), so the Spark read surface carries the same facility:
render the mustache subset ES templates actually use, parse the JSON,
and hand the query dict to :func:`bool_query_filter`.

Supported mustache subset (the constructs the ES docs document for
search templates):

* ``{{var}}`` — scalar substitution (numbers stay numbers when they
  fill a bare JSON slot; inside string literals they join the string);
* ``{{#toJson}}var{{/toJson}}`` — JSON-encode a param (lists/dicts
  into a bare slot — the documented way to pass arrays);
* ``{{var}}{{^var}}default{{/var}}`` — default values: the inverted
  section renders only when the param is absent/falsy.

Rendering is driver-side string work over a stored-template registry
(O(#templates), control-plane by construction); the rendered query
compiles to the same single Catalyst predicate every other bool query
does.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame

from monstache_spark.operators.search import bool_query_filter

_TOJSON_RE = re.compile(r"\{\{#toJson\}\}\s*(\w+)\s*\{\{/toJson\}\}")
_INVERTED_RE = re.compile(r"\{\{\^(\w+)\}\}(.*?)\{\{/\1\}\}", re.DOTALL)
_VAR_RE = re.compile(r"\{\{(\w+)\}\}")


def render_template(source: str | dict, params: dict) -> dict:
    """Render a search-template source with ``params`` and parse the
    result as a query dict.  A dict source is serialized first (ES
    accepts both the string and object forms of ``source``)."""
    text = source if isinstance(source, str) else json.dumps(source)

    def tojson(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise KeyError(f"template param missing for toJson: {name}")
        return json.dumps(params[name])

    text = _TOJSON_RE.sub(tojson, text)

    def inverted(m: re.Match) -> str:
        name, default = m.group(1), m.group(2)
        return default if not params.get(name) else ""

    text = _INVERTED_RE.sub(inverted, text)

    def var(m: re.Match) -> str:
        name = m.group(1)
        v = params.get(name)
        if v is None:
            return ""
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    text = _VAR_RE.sub(var, text)
    try:
        return json.loads(text)
    except json.JSONDecodeError as e:
        raise ValueError(f"rendered template is not valid JSON: {e}") from e


class TemplateRegistry:
    """The stored-scripts store for search templates: ``put`` at deploy
    time, ``search`` with params at query time — the
    ``_scripts/<id>`` + ``_search/template`` round trip."""

    def __init__(self):
        self._templates: dict[str, str | dict] = {}

    def put(self, template_id: str, source: str | dict) -> None:
        self._templates[template_id] = source

    def get(self, template_id: str) -> str | dict:
        try:
            return self._templates[template_id]
        except KeyError:
            raise KeyError(f"no stored template: {template_id}") from None

    def render(self, template_id: str, params: dict) -> dict:
        return render_template(self.get(template_id), params)

    def search(
        self,
        df: DataFrame,
        template_id: str,
        params: dict,
        analyzer=None,
        mappings=None,
    ) -> DataFrame:
        """Render the stored template and run it as a bool query —
        the ``_search/template`` endpoint."""
        return bool_query_filter(
            df, self.render(template_id, params),
            analyzer=analyzer, mappings=mappings,
        )
