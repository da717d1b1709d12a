"""User-defined function surface (SURVEY.md §2.F UDF/UDAF/UDTF row)."""
