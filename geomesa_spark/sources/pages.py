"""Deterministic Common-Crawl-style web-pages corpus + geoparse stage.

The engine's primary input (BASELINE.json input_hint) is a table of web pages
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
whose geometries are geoparsed deterministically from ``text``. This module:

- ``generate_pages(spark, n)``: seeded, fully distributed generator
  (spark.range -> one Arrow-batched pUDF; text embeds coordinate mentions).
  80% of coordinates cluster in 20 dense "urban" hot cells, 20% uniform
  world — reproducing the hot-cell skew the join must survive.
- ``geoparse(df)``: text -> (lon, lat) as a pure function of text (the
  per-row invariant: byte-identical text per url -> identical geometry).
  Vectorized C-level regex; mirrors the reference converter ingest stage
  (geomesa-convert transforms, GeometryFunctionFactory.scala:31-88).

At 10^12-doc scale the same generator shape runs as spark.range(N) with the
id as the only driver of every column — no driver-side data, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# 20 dense "urban" hot cells (lon, lat) — major metros
URBAN_CENTERS = np.array([
    (-74.006, 40.713), (2.352, 48.857), (139.692, 35.690), (-0.128, 51.507),
    (116.407, 39.904), (77.209, 28.614), (-46.633, -23.551), (31.236, 30.044),
    (151.209, -33.868), (-99.133, 19.433), (72.878, 19.076), (37.618, 55.756),
    (126.978, 37.567), (-87.630, 41.878), (-118.244, 34.052), (103.820, 1.352),
    (28.979, 41.008), (114.109, 22.396), (-58.382, -34.603), (18.424, -33.925),
], dtype=np.float64)

LANGS = np.array(["en", "de", "fr", "es", "pt", "zh"])
SEED = 42

# gazetteer: place name -> URBAN_CENTERS index (geoparse resolves mentions
# to the city center; deterministic, part of the per-row invariant)
CITY_NAMES = [
    "NewYork", "Paris", "Tokyo", "London", "Beijing", "Delhi", "SaoPaulo",
    "Cairo", "Sydney", "MexicoCity", "Mumbai", "Moscow", "Seoul", "Chicago",
    "LosAngeles", "Singapore", "Istanbul", "HongKong", "BuenosAires",
    "CapeTown",
]
GAZETTEER = {name: (float(URBAN_CENTERS[i, 0]), float(URBAN_CENTERS[i, 1]))
             for i, name in enumerate(CITY_NAMES)}


def _mix(ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64) of id+salt — the only RNG used."""
    k = (salt * 0x9E3779B97F4A7C15 + SEED) & 0xFFFFFFFFFFFFFFFF
    z = (ids.astype(np.uint64) + np.uint64(k)).astype(np.uint64)
    z = (z + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _uniform(ids: np.ndarray, salt: int) -> np.ndarray:
    """[0,1) doubles from the mix."""
    return (_mix(ids, salt) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def page_coords(ids: np.ndarray):
    """Deterministic (lon, lat) per page id with hot-cell skew."""
    u_sel = _uniform(ids, 1)
    hot = u_sel < 0.8
    center_idx = (_mix(ids, 2) % np.uint64(len(URBAN_CENTERS))).astype(np.int64)
    # urban: gaussian-ish jitter ~0.05 deg around the center (box-muller-free:
    # sum of uniforms keeps it deterministic and cheap)
    jx = (_uniform(ids, 3) + _uniform(ids, 4) - 1.0) * 0.1
    jy = (_uniform(ids, 5) + _uniform(ids, 6) - 1.0) * 0.05
    lon_hot = URBAN_CENTERS[center_idx, 0] + jx
    lat_hot = URBAN_CENTERS[center_idx, 1] + jy
    lon_uni = _uniform(ids, 7) * 360.0 - 180.0
    lat_uni = _uniform(ids, 8) * 180.0 - 90.0
    lon = np.where(hot, lon_hot, lon_uni)
    lat = np.where(hot, lat_hot, lat_uni)
    return np.round(lon, 5), np.round(lat, 5)


_PAGE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", LongType()),  # epoch millis; cast to timestamp outside
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def generate_pages(spark, n: int, partitions: int | None = None,
                   place_mentions: bool = False) -> DataFrame:
    """Seeded web-pages table of n rows; deterministic per id.

    place_mentions=True makes ~10% of pages reference a gazetteer city
    name ("located in NewYork") instead of literal coordinates; geoparse
    resolves them through the broadcast gazetteer. Off by default so the
    generate_points fast path stays bit-identical to the parse output.
    """

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            lon, lat = page_coords(ids)
            ids_s = pd.Series(ids).astype(str)
            urls = "https://site" + pd.Series(ids % 997).astype(str) + ".example/" + ids_s
            ts = 1704067200000 + (ids * 37_000) % (365 * 86_400_000)
            lang = LANGS[(_mix(ids, 9) % np.uint64(len(LANGS))).astype(np.int64)]
            # C-level formatting (np.char.mod) — identical output to f"{v:.5f}"
            lat_s = pd.Series(np.char.mod("%.5f", lat))
            lon_s = pd.Series(np.char.mod("%.5f", lon))
            filler = pd.Series(np.char.mod("%016x", _mix(ids, 10)))
            text = (
                "page " + ids_s
                + " located at " + lat_s + ", " + lon_s
                + " token " + filler
            )
            if place_mentions:
                is_place = (_mix(ids, 20) % np.uint64(10)) == 0
                city_idx = (_mix(ids, 21) % np.uint64(len(CITY_NAMES))).astype(np.int64)
                cities = pd.Series(np.array(CITY_NAMES, dtype=object)[city_idx])
                place_text = ("page " + ids_s + " located in " + cities
                              + " token " + filler)
                text = text.where(~pd.Series(is_place), place_text)
            # messy-page template (operators/corpus.wrap_html shape, plus
            # three deterministic absolute OUTLINKS in the nav): head/
            # script/style + nav/footer boilerplate around the one real
            # paragraph, so corpus.extract_html_text(html) == text
            # byte-identically (the input_hint per-row invariant; nav
            # content — links included — is stripped as boilerplate; text
            # here is single-spaced with no &<> so escaping is identity).
            # Outlink j targets host site{_mix(id, 30+j) % 997}.example —
            # the link-graph layer (corpus.extract_links) derives from
            # the same splitmix stream as every other column.
            o0 = pd.Series(np.char.mod("%d", _mix(ids, 30) % np.uint64(997)))
            o1 = pd.Series(np.char.mod("%d", _mix(ids, 31) % np.uint64(997)))
            o2 = pd.Series(np.char.mod("%d", _mix(ids, 32) % np.uint64(997)))
            html = (
                "<html><head><title>doc " + ids_s
                + '</title><script type="text/javascript">var t = 1 < 2;'
                + "</script><style>p { margin: 0 }</style></head><body>"
                + '<nav><a href="/">Home</a> &amp; <a href="/about">About</a>'
                + ' <a href="https://site' + o0 + '.example/r">r1</a>'
                + ' <a href="https://site' + o1 + '.example/r">r2</a>'
                + ' <a href="https://site' + o2 + '.example/r">r3</a>'
                + "</nav>\n<p>" + text + "</p>\n<!-- generated -->"
                + "<footer>&copy; example&nbsp;site</footer></body></html>"
            ).str.encode("utf-8")
            yield pd.DataFrame({
                "url": urls, "warc_ts": ts, "html": html, "text": text, "lang": lang,
            })

    rng = spark.range(0, n, numPartitions=partitions or max(1, n // 250_000) or 1)
    df = rng.mapInPandas(gen, schema=_PAGE_SCHEMA)
    return df.withColumn("warc_ts", (F.col("warc_ts") / 1000).cast("timestamp"))


_POINT_SCHEMA = StructType([
    StructField("page_id", LongType()),
    StructField("lon", DoubleType()),
    StructField("lat", DoubleType()),
])


def generate_points(spark, n: int, partitions: int | None = None) -> DataFrame:
    """The geoparsed-points layer directly (numpy-only, no string building).

    Produces exactly the (lon, lat) a generate_pages -> geoparse pipeline
    yields for the same ids (page_coords is the shared kernel), so join
    benchmarks measure the join, not corpus string formatting.
    """

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            lon, lat = page_coords(ids)
            yield pd.DataFrame({"page_id": ids, "lon": lon, "lat": lat})

    rng = spark.range(0, n, numPartitions=partitions or max(1, n // 250_000))
    return rng.mapInPandas(gen, schema=_POINT_SCHEMA)


_GEO_RE = r"located at (-?\d+\.\d+), (-?\d+\.\d+)"
_PLACE_RE = r"located in (\w+)"


def geoparse(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages -> points view: adds (lon, lat) doubles parsed from text.

    Pure function of text (the per-row invariant). Rows without a coordinate
    mention are dropped. Stays fully vectorized (pandas C regex).
    """

    coord_schema = StructType([
        StructField("lat", DoubleType()), StructField("lon", DoubleType()),
    ])

    @pandas_udf(coord_schema)
    def parse_coords(s: pd.Series) -> pd.DataFrame:
        ext = s.str.extract(_GEO_RE, expand=True)  # single C-regex pass
        lat = pd.to_numeric(ext[0], errors="coerce")
        lon = pd.to_numeric(ext[1], errors="coerce")
        miss = lat.isna()
        if miss.any():
            # place-mention resolution through the gazetteer
            places = s[miss].str.extract(_PLACE_RE, expand=True)[0]
            lon = lon.copy()
            lat = lat.copy()
            lon[miss] = places.map(lambda c: GAZETTEER.get(c, (np.nan, np.nan))[0]
                                   if isinstance(c, str) else np.nan)
            lat[miss] = places.map(lambda c: GAZETTEER.get(c, (np.nan, np.nan))[1]
                                   if isinstance(c, str) else np.nan)
        return pd.DataFrame({"lat": lat, "lon": lon})

    out = (pages.withColumn("__coords__", parse_coords(F.col(text_col)))
                .withColumn("lat", F.col("__coords__.lat"))
                .withColumn("lon", F.col("__coords__.lon"))
                .drop("__coords__"))
    return out.filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())


def generate_polys(spark, n: int, seed_salt: int = 77,
                   scale: float = 1.0) -> DataFrame:
    """Seeded rectangle polygons (reference SparkSQLTestUtils.generatePolys
    shape: center uniform world, half-width U(0,1.5), half-height U(0,0.5));
    ``scale`` shrinks the half-extent distribution for layer-join probes."""

    schema = StructType([
        StructField("poly_id", LongType()),
        StructField("xmin", DoubleType()),
        StructField("ymin", DoubleType()),
        StructField("xmax", DoubleType()),
        StructField("ymax", DoubleType()),
        StructField("geom", BinaryType()),
    ])

    def gen(iterator):
        from ..geom.wkb import Polygon, wkb_write

        for pdf in iterator:
            ids = pdf["id"].to_numpy(dtype=np.int64) + seed_salt * 1_000_003
            # half the polygons sit on urban hot cells (so the join output
            # inherits the corpus skew), half are uniform world
            urban = _uniform(ids, 15) < 0.5
            cidx = (_mix(ids, 16) % np.uint64(len(URBAN_CENTERS))).astype(np.int64)
            x = np.where(urban,
                         URBAN_CENTERS[cidx, 0] + (_uniform(ids, 11) - 0.5) * 2.0,
                         _uniform(ids, 11) * 360.0 - 180.0)
            y = np.where(urban,
                         URBAN_CENTERS[cidx, 1] + (_uniform(ids, 12) - 0.5) * 1.0,
                         _uniform(ids, 12) * 180.0 - 90.0)
            w = _uniform(ids, 13) * 1.5 * scale
            h = _uniform(ids, 14) * 0.5 * scale
            xmin, xmax = x - w, x + w
            ymin, ymax = y - h, y + h
            wkbs = []
            for a, b, c, d in zip(xmin, ymin, xmax, ymax):
                ring = np.array([[a, b], [a, d], [c, d], [c, b], [a, b]])
                wkbs.append(wkb_write(Polygon(ring)))
            yield pd.DataFrame({
                "poly_id": pdf["id"].to_numpy(), "xmin": xmin, "ymin": ymin,
                "xmax": xmax, "ymax": ymax, "geom": wkbs,
            })

    return spark.range(0, n, numPartitions=max(1, n // 100_000) or 1).mapInPandas(gen, schema=schema)


def generate_circle_polys(spark, n: int, n_vertices: int = 24,
                          seed_salt: int = 78, scale: float = 1.0) -> DataFrame:
    """Seeded convex n-gon polygons (circle approximations).

    Same center/size distribution as generate_polys but non-rectangular,
    so spatial joins exercise the exact PIP kernel on every candidate —
    the compute-bound benchmark shape. ``scale`` shrinks/expands the
    half-extent distribution (a 100k-polygon layer at scale 0.2 keeps
    the join's expected matches-per-row realistic for region layers).
    """
    schema = StructType([
        StructField("poly_id", LongType()),
        StructField("geom", BinaryType()),
    ])
    ang = np.linspace(0.0, 2.0 * np.pi, n_vertices, endpoint=False)

    def gen(iterator):
        from ..geom.wkb import Polygon, wkb_write

        for pdf in iterator:
            ids = pdf["id"].to_numpy(dtype=np.int64) + seed_salt * 1_000_003
            urban = _uniform(ids, 15) < 0.5
            cidx = (_mix(ids, 16) % np.uint64(len(URBAN_CENTERS))).astype(np.int64)
            x = np.where(urban,
                         URBAN_CENTERS[cidx, 0] + (_uniform(ids, 11) - 0.5) * 2.0,
                         _uniform(ids, 11) * 360.0 - 180.0)
            y = np.where(urban,
                         URBAN_CENTERS[cidx, 1] + (_uniform(ids, 12) - 0.5) * 1.0,
                         _uniform(ids, 12) * 180.0 - 90.0)
            w = (_uniform(ids, 13) * 1.5 + 0.05) * scale
            h = (_uniform(ids, 14) * 0.5 + 0.05) * scale
            wkbs = []
            for xi, yi, wi, hi in zip(x, y, w, h):
                ring = np.empty((n_vertices + 1, 2))
                ring[:-1, 0] = xi + np.cos(ang) * wi
                ring[:-1, 1] = yi + np.sin(ang) * hi
                ring[-1] = ring[0]
                wkbs.append(wkb_write(Polygon(ring)))
            yield pd.DataFrame({"poly_id": pdf["id"].to_numpy(), "geom": wkbs})

    return spark.range(0, n, numPartitions=max(1, n // 100_000) or 1).mapInPandas(gen, schema=schema)
