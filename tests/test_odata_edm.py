from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructType,
    TimestampType,
)

from erpl_web_spark.odata.edm import EdmModel, edm_primitive_to_spark
from fixtures.odata_server import EDMX_V2, EDMX_V4


def test_primitive_map():
    cases = {
        "Edm.Binary": "binary",
        "Edm.Boolean": "boolean",
        "Edm.Byte": "tinyint",
        "Edm.SByte": "tinyint",
        "Edm.Date": "date",
        "Edm.DateTime": "timestamp",
        "Edm.DateTimeOffset": "timestamp",
        "Edm.Double": "double",
        "Edm.Guid": "string",
        "Edm.Int16": "smallint",
        "Edm.Int32": "int",
        "Edm.Int64": "bigint",
        "Edm.Single": "float",
        "Edm.String": "string",
        "Edm.Time": "string",
        "Edm.TimeOfDay": "string",
        "Edm.GeographyPoint": "string",
        "Edm.SomethingUnknown": "string",
    }
    for edm, expected in cases.items():
        assert edm_primitive_to_spark(edm).simpleString() == expected, edm


def test_decimal_defaults_and_clamping():
    assert edm_primitive_to_spark("Edm.Decimal") == DecimalType(18, 0)
    assert edm_primitive_to_spark("Edm.Decimal", "19", "4") == DecimalType(19, 4)
    # p clamped to 38; s clamped to p (reference odata_edm.hpp:2111-2118)
    assert edm_primitive_to_spark("Edm.Decimal", "45", "40") == DecimalType(38, 38)
    assert edm_primitive_to_spark("Edm.Decimal", "10", "variable") == DecimalType(10, 0)


def test_v4_entity_schema():
    model = EdmModel.from_xml(EDMX_V4)
    schema = model.schema_for_entity_set("People")
    by_name = {f.name: f for f in schema.fields}
    assert isinstance(by_name["UserName"].dataType, StringType)
    assert by_name["UserName"].nullable is False
    assert isinstance(by_name["Age"].dataType, LongType)
    assert by_name["Balance"].dataType == DecimalType(19, 4)
    assert isinstance(by_name["Score"].dataType, DoubleType)
    assert isinstance(by_name["Active"].dataType, BooleanType)
    assert isinstance(by_name["Joined"].dataType, TimestampType)
    assert by_name["Emails"].dataType == ArrayType(StringType())
    # complex type -> nested struct, recursively
    home = by_name["HomeAddress"].dataType
    assert isinstance(home, StructType)
    assert isinstance(home["City"].dataType, StructType)
    assert {f.name for f in home["City"].dataType.fields} == {"Name", "Country"}
    # enum -> member-name strings
    assert isinstance(by_name["Segment"].dataType, StringType)
    # nav props excluded by default (odata_edm.hpp:2271-2274)
    assert "Orders" not in by_name


def test_v4_expand_typing():
    model = EdmModel.from_xml(EDMX_V4)
    schema = model.schema_for_entity_set("People", expand=["Orders"])
    orders = schema["Orders"].dataType
    assert isinstance(orders, ArrayType)  # collection nav -> LIST(STRUCT)
    assert isinstance(orders.elementType, StructType)
    assert {f.name for f in orders.elementType.fields} == {
        "OrderID", "UserName", "Amount", "Placed",
    }


def test_v2_association_resolution():
    model = EdmModel.from_xml(EDMX_V2)
    assert model.version == "1.0"
    schema = model.schema_for_entity_set("Customers", expand=["Orders"])
    orders = schema["Orders"].dataType
    assert isinstance(orders, ArrayType)  # Multiplicity="*" -> collection
    assert {f.name for f in orders.elementType.fields} == {
        "OrderID", "CustomerID", "Freight",
    }
    assert model.key_for_entity_set("Customers") == ["CustomerID"]


def test_base_type_flattening_and_cycle_guard():
    xml = """<?xml version="1.0"?>
    <edmx:Edmx Version="4.0" xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
      <edmx:DataServices>
        <Schema Namespace="S" xmlns="http://docs.oasis-open.org/odata/ns/edm">
          <EntityType Name="Base">
            <Key><PropertyRef Name="Id"/></Key>
            <Property Name="Id" Type="Edm.Int32" Nullable="false"/>
          </EntityType>
          <EntityType Name="Derived" BaseType="S.Base">
            <Property Name="Extra" Type="Edm.String"/>
          </EntityType>
          <ComplexType Name="Node">
            <Property Name="Label" Type="Edm.String"/>
            <Property Name="Next" Type="S.Node"/>
          </ComplexType>
          <EntityType Name="Holder">
            <Key><PropertyRef Name="Id"/></Key>
            <Property Name="Id" Type="Edm.Int32" Nullable="false"/>
            <Property Name="Tree" Type="S.Node"/>
          </EntityType>
          <EntityContainer Name="C">
            <EntitySet Name="Deriveds" EntityType="S.Derived"/>
            <EntitySet Name="Holders" EntityType="S.Holder"/>
          </EntityContainer>
        </Schema>
      </edmx:DataServices>
    </edmx:Edmx>"""
    model = EdmModel.from_xml(xml)
    derived = model.schema_for_entity_set("Deriveds")
    assert [f.name for f in derived.fields] == ["Id", "Extra"]  # base first
    holder = model.schema_for_entity_set("Holders")  # must not recurse forever
    tree = holder["Tree"].dataType
    assert isinstance(tree, StructType)
    assert isinstance(tree["Next"].dataType, StringType)  # cycle cut to string
