"""Predictor zoo. Importing this package registers all predictors with
the model factory (`gptst_tpu.models.build`)."""

import gptst_tpu.models.build  # noqa: F401  (registrations live there)
