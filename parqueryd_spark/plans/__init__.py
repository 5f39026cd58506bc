from parqueryd_spark.plans.audit import explain_str, plan_report

__all__ = ["explain_str", "plan_report"]
