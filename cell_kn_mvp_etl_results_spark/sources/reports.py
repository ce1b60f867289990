"""Report sinks + small driver-side utilities (SURVEY.md K6, K8, C9, C12).

K8: the triple-components report -- unique subject/predicate/object
types and names dumped for review (``AnnotationResultsTupleWriter.py:19-90``).
K6 writes real multi-sheet .xlsx via the stdlib codec
(:func:`write_report_xlsx`, re-exported from :mod:`.xlsx`); CSV
directories remain available as the distributed-write alternative.
C12: OWL version parsing/compare used to decide ontology re-download
(``OntologyParserLoader.py:50-149``) -- a driver-side utility, not a
data-plane operator.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .xlsx import write_report_xlsx  # noqa: F401  (K6 public surface)


def triple_components_report(tuples: DataFrame) -> dict[str, DataFrame]:
    """K8: distinct subjects / predicates / objects (with literal-object
    split) of a tuples relation."""
    triples = tuples.filter(F.col("lit").isNull())
    quads = tuples.filter(F.col("lit").isNotNull())
    return {
        "subjects": tuples.select("s").distinct(),
        "predicates": tuples.select("p").distinct(),
        "objects": triples.select("o").distinct(),
        "edge_annotations": quads.select("p").distinct(),
    }


def write_report(report: dict[str, DataFrame], base_path: str) -> None:
    """K6 analog: one CSV directory per sheet."""
    for name, df in report.items():
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(
            f"{base_path}/{name}"
        )


_VERSION_DATE = re.compile(r"(\d{4}-\d{2}-\d{2})")


def parse_version_date(version_info: str | None) -> str | None:
    """C12: extract the release date from an OWL versionInfo/versionIRI
    string (e.g. ``http://purl.obolibrary.org/obo/cl/releases/2024-01-04/cl.owl``
    or ``2024-01-04``). None when absent."""
    if not version_info:
        return None
    m = _VERSION_DATE.search(version_info)
    return m.group(1) if m else None


def is_newer_version(current: str | None, candidate: str | None) -> bool:
    """C12: lexicographic date compare (ISO dates sort correctly);
    an unknown current version is always refreshed."""
    cand = parse_version_date(candidate)
    if cand is None:
        return False
    cur = parse_version_date(current)
    return cur is None or cand > cur
