"""Facade service-path parity: async actor-mailbox analogue and the
reference's caller-visible limit-drop quirk.

Reference behavior pinned here:
- the facade is an async actor; operations through it are serialized by its
  mailbox, so an async index followed by an async search observes the write
  (LuceneFacadeImpl.java:23-151; single-writer actor LuceneWriterImpl.java:20);
- the HTTP reader path drops the caller's limit and substitutes 255
  (LuceneReaderImpl.java:100-104, Base.java:102) — TestPaging.java:31-60
  passes BECAUSE of this (10 hits returned even when the caller asks for 5
  through the service path).
"""

import pytest

from lucene_plugin_spark.api import LuceneFacade


@pytest.fixture()
def fac(spark, tmp_path):
    return LuceneFacade(spark, str(tmp_path / "wh"))


def test_async_mailbox_orders_write_before_read(fac):
    seen = []
    fac.index_text_async("default", "0", "mary had a little lamb")
    fac.index_text_async("default", "1", "the quick brown fox",
                         callback=lambda ok: seen.append(ok))
    fut = fac.search_async("default", "lamb")
    hits = fut.result(timeout=300)
    assert [h.external_id for h in hits] == ["0"]
    assert seen == [True]  # callback fired with the method's return value


def test_async_delete_then_search(fac):
    fac.index_text("default", "0", "alpha beta")
    fac.index_text("default", "1", "alpha gamma")
    fac.delete_async("default", "0")
    hits = fac.search_async("default", "alpha").result(timeout=300)
    assert [h.external_id for h in hits] == ["1"]


def test_service_limit_drop(spark, tmp_path):
    fac = LuceneFacade(spark, str(tmp_path / "wh2"), service_limit_drop=True)
    for i in range(10):
        fac.index_text("default", str(i), f"poodle number {i}")
    # caller asks for 3; the service path substitutes 255 -> all 10 come back
    assert len(fac.search("default", "poodle", limit=3)) == 10
    # without the quirk the limit is honored
    fac2 = LuceneFacade(spark, str(tmp_path / "wh3"))
    for i in range(10):
        fac2.index_text("default", str(i), f"poodle number {i}")
    assert len(fac2.search("default", "poodle", limit=3)) == 3
