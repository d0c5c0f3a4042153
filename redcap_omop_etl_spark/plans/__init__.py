"""Pipeline/transform framework: named lazy DataFrame → DataFrame stages."""

from redcap_omop_etl_spark.plans.pipeline import Pipeline, Transform, TransformOutput

__all__ = ["Pipeline", "Transform", "TransformOutput"]
