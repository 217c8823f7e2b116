"""Sources / sinks (SURVEY.md §2 Group B)."""

from featureextraction_jl_spark.sources.tables import (  # noqa: F401
    read_table,
    read_transcripts,
    bucket_and_sort,
    write_features,
    TRANSCRIPT_SCHEMA,
)
from featureextraction_jl_spark.sources.fixtures import (  # noqa: F401
    generate_transcripts,
    generate_snapshots,
)
