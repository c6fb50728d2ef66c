"""Pure (Ray-free) functions shared by pipelines, stages, oracle and tests."""
