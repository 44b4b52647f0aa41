"""Pipeline plans: seeding, growth/enrichment, dataset versioning, task DAG."""

from datagrowth_spark.plans.seeding import SeedingProcessor
from datagrowth_spark.plans.growth import GrowthProcessor
from datagrowth_spark.plans.dataset import Dataset, DatasetWarehouse, GrowthStrategy, DGGrowthFrozen

__all__ = [
    "SeedingProcessor",
    "GrowthProcessor",
    "Dataset",
    "DatasetWarehouse",
    "GrowthStrategy",
    "DGGrowthFrozen",
]
