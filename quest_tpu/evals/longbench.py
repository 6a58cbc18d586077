"""LongBench prediction harness.

Mirrors `/root/reference/evaluation/LongBench/pred.py`: per-task prompt
templates, middle-truncation of over-long contexts, the
prefill-context-then-decode-question trick (:122-150) so Quest sparsity
applies to the question and answer tokens, jsonl predictions, and
`eval.py`-style scoring (see longbench_metrics.py).

Dataset jsonl files must be available locally (zero-egress environment);
pass their directory as ``data_dir``. Each line: {"input", "context",
"answers", "all_classes", ...} following the LongBench schema.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

from quest_tpu.engine.engine import QuestEngine
from quest_tpu.evals.longbench_metrics import score_task

# Per-task prompt formats + generation lengths
# (`/root/reference/evaluation/LongBench/config/dataset2prompt.json`,
#  `dataset2maxlen.json`).
TASK_PROMPTS: Dict[str, str] = {
    "narrativeqa": "You are given a story, which can be either a novel or a movie script, and a question. Answer the question as concisely as you can, using a single phrase if possible. Do not provide any explanation.\n\nStory: {context}\n\nNow, answer the question based on the story as concisely as you can, using a single phrase if possible. Do not provide any explanation.\n\nQuestion: {input}\n\nAnswer:",
    "qasper": "You are given a scientific article and a question. Answer the question as concisely as you can, using a single phrase or sentence if possible. If the question cannot be answered based on the information in the article, write \"unanswerable\". If the question is a yes/no question, answer \"yes\", \"no\", or \"unanswerable\". Do not provide any explanation.\n\nArticle: {context}\n\n Answer the question based on the above article as concisely as you can, using a single phrase or sentence if possible. If the question cannot be answered based on the information in the article, write \"unanswerable\". If the question is a yes/no question, answer \"yes\", \"no\", or \"unanswerable\". Do not provide any explanation.\n\nQuestion: {input}\n\nAnswer:",
    "multifieldqa_en": "Read the following text and answer briefly.\n\n{context}\n\nNow, answer the following question based on the above text, only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:",
    "hotpotqa": "Answer the question based on the given passages. Only give me the answer and do not output any other words.\n\nThe following are given passages.\n{context}\n\nAnswer the question based on the given passages. Only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:",
    "gov_report": "You are given a report by a government agency. Write a one-page summary of the report.\n\nReport:\n{context}\n\nNow, write a one-page summary of the report.\n\nSummary:",
    "triviaqa": "Answer the question based on the given passage. Only give me the answer and do not output any other words. The following are some examples.\n\n{context}\n\n{input}",
}

TASK_MAXLEN: Dict[str, int] = {
    "narrativeqa": 128, "qasper": 128, "multifieldqa_en": 64,
    "hotpotqa": 32, "gov_report": 512, "triviaqa": 32,
}


def truncate_middle(tokenizer, prompt: str, max_length: int) -> str:
    """LongBench truncation: keep head+tail halves (`pred.py`)."""
    ids = tokenizer.encode(prompt)
    if len(ids) <= max_length:
        return prompt
    half = max_length // 2
    return (tokenizer.decode(ids[:half], skip_special_tokens=True)
            + tokenizer.decode(ids[-half:], skip_special_tokens=True))


def predict_task(engine: QuestEngine, tokenizer, task: str,
                 samples: List[dict], max_prompt_len: int,
                 out_path: Optional[str] = None,
                 decode_question: bool = True) -> List[str]:
    """Generate predictions for one task's samples."""
    template = TASK_PROMPTS[task]
    gen_len = TASK_MAXLEN[task]
    preds: List[str] = []
    outf = open(out_path, "w") if out_path else None
    for sample in samples:
        prompt = template.format(**sample)
        prompt = truncate_middle(tokenizer, prompt, max_prompt_len)
        ids = tokenizer.encode(prompt)
        engine.clear()
        if decode_question and len(ids) > 64:
            # Prefill all but the final question tokens; decode those
            # token-by-token so sparsity is active (`pred.py:122-150`).
            # Question feed + greedy answer run as async on-device
            # bursts (no per-token host fetch); EOS is trimmed
            # host-side from the over-generated tail.
            split = len(ids) - 32
            engine.prefill([ids[:split]])
            engine.feed_ondevice([ids[split:-1]])
            out_ids = engine.greedy_ondevice([ids[-1]],
                                             gen_len)[0].tolist()
        else:
            logits = engine.prefill([ids])
            first = int(logits[0].argmax())
            out_ids = [first]
            if gen_len > 1:
                out_ids += engine.greedy_ondevice([first],
                                                  gen_len - 1)[0].tolist()
        eos = getattr(tokenizer, "eos_token_id", -1)
        if eos is not None and eos in out_ids:
            out_ids = out_ids[: out_ids.index(eos)]
        text = tokenizer.decode(out_ids, skip_special_tokens=True)
        preds.append(text)
        if outf:
            print(json.dumps({"pred": text,
                              "answers": sample.get("answers", []),
                              "all_classes": sample.get("all_classes", [])}),
                  file=outf, flush=True)
    if outf:
        outf.close()
    return preds


def load_jsonl(path: str) -> List[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def evaluate_longbench(engine: QuestEngine, tokenizer, data_dir: str,
                       tasks: List[str], max_prompt_len: int,
                       out_dir: Optional[str] = None) -> Dict[str, float]:
    """Run predictions + scoring; returns {task: score}."""
    results: Dict[str, float] = {}
    for task in tasks:
        samples = load_jsonl(os.path.join(data_dir, f"{task}.jsonl"))
        out_path = (os.path.join(out_dir, f"{task}.jsonl")
                    if out_dir else None)
        preds = predict_task(engine, tokenizer, task, samples,
                             max_prompt_len, out_path)
        golds = [s.get("answers", [""]) for s in samples]
        classes = samples[0].get("all_classes", []) if samples else []
        results[task] = score_task(task, preds, golds, classes)
    return results
