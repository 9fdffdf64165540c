import pytest
from pyspark.sql import functions as F

from jena_spark.mentions import extract_mentions, camel_split, mention_entities


@pytest.fixture(scope="module")
def code_files(spark):
    content = '''
import os
class HttpClient:
    def send_request(self, request_url):
        return os.path.join(request_url, "x")
HTTP_CLIENT = HttpClient()
'''
    return spark.createDataFrame(
        [("r", "a/client.py", "c" * 40, "python", content)],
        ["repo", "path", "commit", "lang", "content"],
    )


def test_extract_mentions(code_files):
    m = {r["mention"]: r["n_occurrences"] for r in extract_mentions(code_files).collect()}
    assert m["HttpClient"] == 2
    assert m["send_request"] == 1
    assert m["request_url"] == 2
    assert "import" not in m and "def" not in m and "os" not in m  # stopwords/short


def test_camel_split(spark):
    df = spark.createDataFrame([("HttpClient",), ("snake_case_name",)], ["x"])
    out = [r["y"] for r in df.select(camel_split(F.col("x")).alias("y")).collect()]
    assert out == ["Http Client", "snake case name"]


def test_mention_linking_end_to_end(spark, code_files):
    entities = spark.createDataFrame(
        [
            ("http://e/HttpClient", "HttpClient"),
            ("http://e/RequestUrl", "requestUrl"),
            ("http://e/Unrelated", "ZzqxWvk"),
        ],
        ["entity_iri", "entity_name"],
    )
    links = {r["mention"]: r["entity_iri"] for r in
             mention_entities(code_files, entities).collect()}
    assert links.get("HttpClient") == "http://e/HttpClient"
    assert links.get("HTTP_CLIENT") == "http://e/HttpClient"  # case/underscore fold
    assert links.get("request_url") == "http://e/RequestUrl"
    assert "http://e/Unrelated" not in links.values()
