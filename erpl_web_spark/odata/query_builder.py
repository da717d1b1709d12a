"""OData query-option URL builder.

Assembles ``$select/$filter/$top/$skip/$expand/$count/$format`` onto a
base entity-set URL with the reference's merge rules (SURVEY.md §2.C):
- always request JSON: ``$format=json`` (helper :231-236);
- never overwrite a user-supplied ``$filter`` (double-encoding guard,
  :365-369);
- '%24'-encoded keys canonicalized (:184-199);
- projection skipped when every column is selected (:432-435);
- v2 requires expanded nav props to also appear in ``$select``
  (auto-augmented, :238-258, 306-353);
- v2 uses ``$inlinecount=allpages``, v4 ``$count=true`` (:669-681);
- input parameters -> ``Entity(k='v')/Set`` URL segment
  (odata_client.cpp:514-538).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from erpl_web_spark.core.url import HttpUrl, merge_query_params


@dataclass
class ODataQueryBuilder:
    base_url: str
    odata_version: int = 4
    select: list[str] = field(default_factory=list)
    all_columns: list[str] = field(default_factory=list)
    filter_expr: str | None = None
    top: int | None = None
    skip: int | None = None
    expand: list[str] = field(default_factory=list)
    count: bool = False
    input_params: dict[str, str] = field(default_factory=dict)
    # Internal stabilizer for $skip range partitioning (not user ORDER BY
    # pushdown — that's deliberately absent, reference parity :657-660):
    # parallel $skip windows are only consistent under a total order.
    orderby: list[str] = field(default_factory=list)
    # OData v4 $apply (server-side groupby/aggregate) — beyond-reference
    # aggregation pushdown; mutually exclusive with $select.
    apply: str | None = None

    def _effective_select(self) -> list[str]:
        if not self.select:
            return []
        # Skip $select when every column is requested anyway (:432-435).
        if self.all_columns and set(self.select) >= set(self.all_columns):
            return []
        cols: list[str] = []
        for c in self.select:
            base = c.split("/")[0].split(".")[0]  # path exprs -> base name (:498-504)
            if base not in cols:
                cols.append(base)
        if self.odata_version == 2 and self.expand:
            # v2 select+expand rule: expanded nav props must be selected too.
            for e in self.expand:
                root = e.split("/")[0]
                if root not in cols:
                    cols.append(root)
        return cols

    def build(self) -> str:
        url = HttpUrl.parse(self.base_url)
        if self.input_params:
            # Entity(k='v')/Set parameterized-view segment.
            path = url.path.rstrip("/")
            head, _, set_name = path.rpartition("/")
            args = ",".join(f"{k}='{v}'" for k, v in self.input_params.items())
            url.path = f"{head}({args})/{set_name}" if head else f"/({args})/{set_name}"

        generated: dict[str, str] = {}
        if self.apply:
            generated["$apply"] = self.apply
        sel = self._effective_select() if not self.apply else []
        if sel:
            generated["$select"] = ",".join(sel)
        if self.filter_expr:
            generated["$filter"] = self.filter_expr
        if self.top is not None:
            generated["$top"] = str(self.top)
        if self.skip is not None:
            generated["$skip"] = str(self.skip)
        if self.expand:
            generated["$expand"] = ",".join(self.expand)
        if self.orderby:
            generated["$orderby"] = ",".join(self.orderby)
        if self.count:
            if self.odata_version == 2:
                generated["$inlinecount"] = "allpages"
            else:
                generated["$count"] = "true"
        generated["$format"] = "json"

        merged = merge_query_params(url.query_params(), generated)
        return url.with_query_params(merged).to_string()
