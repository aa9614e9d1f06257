"""P5 on the reference's true nested log schema: gmall-shaped fixture
rows (FIXTURES.md §1, seed-fixed) through split_behavior_log — start
logs route to start, page logs to page, every displays[i] explodes with
its page_id attached (RT/app/dwd2/BaseLogApp2.java:116-166)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

LOG_SCHEMA = """
    common struct<ar:string, ch:string, is_new:string, mid:string, vc:string>,
    page struct<during_time:bigint, item:string, item_type:string,
                last_page_id:string, page_id:string>,
    displays array<struct<display_type:string, item:string, item_type:string,
                          `order`:bigint, pos_id:bigint>>,
    start struct<entry:string, loading_time:bigint, open_ad_id:bigint>,
    ts bigint
"""

FIXTURE = [
    # start-up log (start struct non-null, no page)
    {"common": {"ar": "230000", "ch": "web", "is_new": "1", "mid": "mid_1", "vc": "v1"},
     "start": {"entry": "icon", "loading_time": 100, "open_ad_id": 7}, "ts": 1000},
    # page log with two displays
    {"common": {"ar": "110000", "ch": "app", "is_new": "0", "mid": "mid_2", "vc": "v2"},
     "page": {"during_time": 5000, "item": "iphone", "item_type": "keyword",
              "last_page_id": None, "page_id": "good_list"},
     "displays": [
         {"display_type": "query", "item": "sku_1", "item_type": "sku_id", "order": 1, "pos_id": 1},
         {"display_type": "promotion", "item": "sku_2", "item_type": "sku_id", "order": 2, "pos_id": 4},
     ],
     "ts": 2000},
    # plain page log, no displays
    {"common": {"ar": "110000", "ch": "app", "is_new": "0", "mid": "mid_2", "vc": "v2"},
     "page": {"during_time": 1200, "item": None, "item_type": None,
              "last_page_id": "good_list", "page_id": "good_detail"},
     "ts": 3000},
]


def test_split_behavior_log_routes_like_reference(spark):
    from gmallbiguan_parent_spark.pipelines.dwd import split_behavior_log

    raw = spark.createDataFrame([(json.dumps(r),) for r in FIXTURE], "payload string")
    logs = raw.select(F.from_json("payload", LOG_SCHEMA).alias("j")).select("j.*")

    start, page, display = split_behavior_log(logs)

    s = start.collect()
    assert [(r.mid, r.entry) for r in s] == [("mid_1", "icon")]

    p = sorted((r.mid, r.page_id, r.last_page_id) for r in page.collect())
    assert p == [("mid_2", "good_detail", "good_list"), ("mid_2", "good_list", None)]

    d = sorted((r.item, r.page_id, r.display_order) for r in display.collect())
    assert d == [("sku_1", "good_list", 1), ("sku_2", "good_list", 2)]
