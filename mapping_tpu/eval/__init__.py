"""Evaluation: COCO AP/AR with the crowdAI fork's summary semantics
(IoU=0.5 only, area splits all / small(<14^2 px) / large —
reference src/cocoeval.py:465-473,510 and src/utils.py:308-321)."""

from mapping_tpu.eval.cocoeval import COCOEvaluator, EvalParams, coco_evaluation

__all__ = ["COCOEvaluator", "EvalParams", "coco_evaluation"]
