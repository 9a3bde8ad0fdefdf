from erkg_tutorials_spark.pipelines.senzing_pipeline import (
    generate_entities,
    generate_aliases,
    filter_suspicious,
    run_senzing_pipeline,
)
