"""Source-provider routing tests (no Spark session needed): the Iceberg
binding is a provider abstraction — on a real cluster with the Iceberg
runtime jar the same calls hit the catalog; offline we verify the routing
with reader stubs (snapshot semantics cannot be tested without the jar —
documented deviation, SURVEY.md §7.6)."""

from __future__ import annotations

from bistro_spark.sources.io import load_table, stream_table


class _Reader:
    def __init__(self):
        self.called = None

    def table(self, name):
        self.called = name
        return f"DF:{name}"


class _FakeSpark:
    def __init__(self):
        self.read = _Reader()
        self.readStream = _Reader()


def test_iceberg_provider_routes_to_catalog():
    s = _FakeSpark()
    assert load_table(s, "tok_corpus", provider="iceberg") == "DF:tok_corpus"
    assert s.read.called == "tok_corpus"


def test_stream_table_routes_to_catalog():
    s = _FakeSpark()
    assert stream_table(s, "tok_corpus") == "DF:tok_corpus"
    assert s.readStream.called == "tok_corpus"
