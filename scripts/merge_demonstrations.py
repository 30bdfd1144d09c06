"""Concatenate demo pickle files (reference scripts/merge_demonstrations.py:24-31)."""

import argparse
import pickle


def main():
    p = argparse.ArgumentParser()
    p.add_argument("inputs", nargs="+")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    merged = []
    for path in args.inputs:
        with open(path, "rb") as f:
            eps = pickle.load(f)
        merged.extend(eps)
        print(f"{path}: {len(eps)} episodes")
    with open(args.out, "wb") as f:
        pickle.dump(merged, f)
    print(f"wrote {len(merged)} episodes to {args.out}")


if __name__ == "__main__":
    main()
