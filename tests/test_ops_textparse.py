"""requirements.txt parsing (J10 parse stage; reference github/repos.py:296-348)."""

from cartography_spark.ops.textparse import parse_requirements


def test_parse_requirements(spark):
    text = """
# comment
requests==2.31.0
Flask>=2.0
pyyaml
some_pkg[extra]~=1.4
-r other.txt
git+https://github.com/x/y.git
UPPER-Case.Pkg==3.0.0
"""
    df = spark.createDataFrame([("https://github.com/corp/r1", text)],
                               ["repo_url", "requirements_text"])
    rows = {r.lib_name: r for r in parse_requirements(df).collect()}
    assert rows["requests"].version == "2.31.0"
    assert rows["requests"].lib_id == "requests|2.31.0"
    assert rows["flask"].version is None and rows["flask"].specifier == ">=2.0"
    assert rows["pyyaml"].specifier is None and rows["pyyaml"].lib_id == "pyyaml"
    assert rows["some-pkg"].specifier == "~=1.4"  # PEP503 normalized name
    assert rows["upper-case-pkg"].version == "3.0.0"
    assert "git+https" not in rows and len(rows) == 5
