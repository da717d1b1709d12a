from urllib.parse import parse_qsl, urlsplit

from erpl_web_spark.odata.query_builder import ODataQueryBuilder


def params_of(url: str) -> dict:
    return dict(parse_qsl(urlsplit(url).query, keep_blank_values=True))


def test_basic_clauses():
    qb = ODataQueryBuilder(
        base_url="http://h/svc/People",
        select=["UserName", "Age"],
        all_columns=["UserName", "Age", "Score"],
        filter_expr="Age gt 21",
        top=10,
        skip=5,
    )
    p = params_of(qb.build())
    assert p["$select"] == "UserName,Age"
    assert p["$filter"] == "Age gt 21"
    assert p["$top"] == "10"
    assert p["$skip"] == "5"
    assert p["$format"] == "json"


def test_select_skipped_when_all_columns():
    qb = ODataQueryBuilder(
        base_url="http://h/svc/People",
        select=["A", "B"],
        all_columns=["A", "B"],
    )
    assert "$select" not in params_of(qb.build())


def test_user_filter_never_overwritten():
    qb = ODataQueryBuilder(
        base_url="http://h/svc/People?%24filter=Name%20eq%20%27x%27",
        filter_expr="Age gt 1",
    )
    p = params_of(qb.build())
    assert p["$filter"] == "Name eq 'x'"  # user's wins, %24 canonicalized


def test_v2_expand_select_augmentation():
    qb = ODataQueryBuilder(
        base_url="http://h/svc/Customers",
        odata_version=2,
        select=["CustomerID"],
        all_columns=["CustomerID", "CompanyName"],
        expand=["Orders"],
    )
    p = params_of(qb.build())
    assert p["$select"] == "CustomerID,Orders"  # expanded nav auto-added
    assert p["$expand"] == "Orders"


def test_count_by_version():
    v4 = ODataQueryBuilder(base_url="http://h/s/E", count=True)
    assert params_of(v4.build())["$count"] == "true"
    v2 = ODataQueryBuilder(base_url="http://h/s/E", odata_version=2, count=True)
    assert params_of(v2.build())["$inlinecount"] == "allpages"


def test_input_parameters_segment():
    qb = ODataQueryBuilder(
        base_url="http://h/svc/Results",
        input_params={"Year": "2024"},
    )
    url = qb.build()
    assert "/svc(Year='2024')/Results?" in url


def test_path_expression_base_name_dedup():
    qb = ODataQueryBuilder(
        base_url="http://h/s/E",
        select=["Home/City", "Home/Street", "Name"],
        all_columns=["Home", "Name", "Other"],
    )
    assert params_of(qb.build())["$select"] == "Home,Name"
