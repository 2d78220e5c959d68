"""Geometry toolkit: WKB/WKT codecs, DE-9IM relate engine, measures.

Pure numpy — no shapely/JTS. Geometry columns in the engine are BinaryType
WKB (same physical encoding as the reference's Catalyst UDTs)."""

from .kernels import (
    contains,
    covered_by,
    covers,
    crosses,
    disjoint,
    equals,
    intersects,
    overlaps,
    pip_rings,
    points_in_polygon,
    relate,
    relate_bool,
    touches,
    within,
)
from .measures import (
    area,
    buffer_point_geodesic,
    centroid,
    closest_point,
    convex_hull,
    distance,
    distance_degrees_geom,
    distance_degrees_point,
    distance_sphere,
    distance_spheroid,
    envelope_geom,
    haversine_m,
    length,
    length_sphere,
    length_spheroid,
    nearest_points,
    translate,
    vincenty_direct,
    vincenty_m,
)
from .wkb import (
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    geojson_write,
    wkb_read,
    wkb_write,
    wkt_read,
    wkt_write,
)
