"""Pipeline plans: the model-stage protocol and the fulltext cascade
(SURVEY §2A A11/A12/A16/A28).
"""
from sciencebeam_parser_spark.plans.models import (  # noqa: F401
    DataFrameLabelModel,
    FunctionLabelModel,
    apply_model,
)
from sciencebeam_parser_spark.plans.cascade import (  # noqa: F401
    CascadeConfig,
    run_fulltext_cascade,
)
