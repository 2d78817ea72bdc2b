/*
 * Hand-written replacement for the reference's generated query
 * scanner/parser (query/scan.re via re2c + query/grammar.y via
 * lemon), used ONLY to build the reference engine for the offline
 * head-to-head benchmark: this image ships neither re2c nor lemon.
 *
 * Semantics match the generated pair exactly for well-formed input:
 *   - tokens: AND ('&'|"and" ci), OR ('|'|"or" ci), NOT ("not" ci),
 *     '(', ')', quoted strings ('..'/".."), free-form strings
 *     (any run excluding NUL/whitespace/parens); maximal munch with
 *     keyword/quoted rules winning length ties (re2c rule order).
 *   - grammar: OR < AND (left-assoc); "AND NOT" is a binary NOT op;
 *     parenthesised sub-expressions; top-level adjacency joins
 *     expressions as OR (grammar.y:80-83); parens contain a full
 *     expr (not an expr_list), so adjacency inside parens is a
 *     syntax error, as in the lemon grammar.
 *
 * Implements lex_init/lex (query.h) and query_parse (grammar.y:124).
 */

#include <stdio.h>
#include <stdlib.h>
#include <stdbool.h>
#include <string.h>

#define __NXSLIB_PRIVATE
#define __NXS_PARSER_PRIVATE
#include "nxs_impl.h"
#include "expr.h"
#include "query.h"

#define TOK_EOF      0
#define TOK_ERR      (-1)
#define TOK_AND      1
#define TOK_OR       2
#define TOK_NOT      3
#define TOK_LPAREN   4
#define TOK_RPAREN   5
#define TOK_STRING   6

void
lex_init(lexer_t *ctx, const char *s)
{
	ctx->cursor = s;
	ctx->cur_line = s;
	ctx->line = 1;
}

static bool
is_sp(char c)
{
	return c == ' ' || c == '\t' || c == '\v' || c == '\f' ||
	    c == '\r' || c == '\n';
}

static bool
is_ff(char c)
{
	return c != '\0' && !is_sp(c) && c != '(' && c != ')';
}

/* Length of a quoted string starting at s (including both quotes),
 * or 0 if there is no well-formed quoted string here. */
static size_t
quoted_len(const char *s)
{
	char q = s[0];
	size_t i = 1;

	if (q != '\'' && q != '"')
		return 0;
	while (s[i] != '\0') {
		if (s[i] == '\\' && s[i + 1] != '\0') {
			i += 2;
			continue;
		}
		if (s[i] == q)
			return i + 1;
		i++;
	}
	return 0;
}

int
lex(query_t *q)
{
	lexer_t *ctx = &q->lexer;
	lexval_t *lval = &q->lval;
	const char *s;

	for (;;) {
		s = ctx->cursor;
		if (*s == '\0')
			return TOK_EOF;
		if (*s == '\n') {
			ctx->line++;
			ctx->cur_line = s + 1;
			ctx->cursor = s + 1;
			continue;
		}
		if (is_sp(*s)) {
			ctx->cursor = s + 1;
			continue;
		}
		break;
	}
	ctx->token = s;

	if (*s == '(') {
		ctx->cursor = s + 1;
		return TOK_LPAREN;
	}
	if (*s == ')') {
		ctx->cursor = s + 1;
		return TOK_RPAREN;
	}

	/* Maximal munch between the quoted-string rule and the
	 * free-form rule; ties go to the quoted rule (re2c order). */
	size_t qlen = quoted_len(s);
	size_t fflen = 0;
	while (is_ff(s[fflen]))
		fflen++;

	if (qlen >= fflen && qlen > 0) {
		lval->len = qlen;
		lval->str = strndup(s + 1, qlen - 2);
		ctx->cursor = s + qlen;
		return TOK_STRING;
	}
	if (fflen == 0) {
		query_set_error(q);
		return TOK_ERR;
	}
	/* Keywords win length ties against FF_STR (re2c rule order). */
	ctx->cursor = s + fflen;
	if (fflen == 1 && *s == '&')
		return TOK_AND;
	if (fflen == 1 && *s == '|')
		return TOK_OR;
	if (fflen == 3 && strncasecmp(s, "and", 3) == 0)
		return TOK_AND;
	if (fflen == 2 && strncasecmp(s, "or", 2) == 0)
		return TOK_OR;
	if (fflen == 3 && strncasecmp(s, "not", 3) == 0)
		return TOK_NOT;
	lval->len = fflen;
	lval->str = strndup(s, fflen);
	return TOK_STRING;
}

/*
 * Recursive-descent parser with one token of lookahead.
 */

typedef struct {
	query_t *q;
	int tok;		/* lookahead */
	char *tokstr;		/* owned string of lookahead (STRING) */
} parser_t;

static void
advance(parser_t *p)
{
	p->tok = lex(p->q);
	p->tokstr = (p->tok == TOK_STRING) ? p->q->lval.str : NULL;
}

static expr_t *parse_or(parser_t *p);

static expr_t *
parse_primary(parser_t *p)
{
	expr_t *e;

	if (p->tok == TOK_STRING) {
		e = expr_create_token(p->tokstr);	/* consumes str */
		p->tokstr = NULL;
		advance(p);
		return e;
	}
	if (p->tok == TOK_LPAREN) {
		advance(p);
		e = parse_or(p);
		if (e == NULL)
			return NULL;
		if (p->tok != TOK_RPAREN) {
			expr_destroy(e);
			query_set_error(p->q);
			return NULL;
		}
		advance(p);
		return e;
	}
	query_set_error(p->q);
	return NULL;
}

static expr_t *
parse_and(parser_t *p)
{
	expr_t *l, *r;

	if ((l = parse_primary(p)) == NULL)
		return NULL;
	while (p->tok == TOK_AND) {
		expr_type_t op = EXPR_OP_AND;
		advance(p);
		if (p->tok == TOK_NOT) {
			op = EXPR_OP_NOT;
			advance(p);
		}
		if ((r = parse_primary(p)) == NULL) {
			expr_destroy(l);
			return NULL;
		}
		l = expr_create_operator(op, l, r);
	}
	return l;
}

static expr_t *
parse_or(parser_t *p)
{
	expr_t *l, *r;

	if ((l = parse_and(p)) == NULL)
		return NULL;
	while (p->tok == TOK_OR) {
		advance(p);
		if ((r = parse_and(p)) == NULL) {
			expr_destroy(l);
			return NULL;
		}
		l = expr_create_operator(EXPR_OP_OR, l, r);
	}
	return l;
}

int
query_parse(query_t *q, const char *query)
{
	parser_t p = { .q = q };
	expr_t *root, *next;

	lex_init(&q->lexer, query);
	advance(&p);

	if (p.tok == TOK_EOF) {
		/* Empty query: same outcome as the lemon parser
		 * (no root, caller reports the empty-AST error). */
		return 0;
	}
	if ((root = parse_or(&p)) == NULL)
		goto err;
	/* Top-level adjacency: expr_list joins full exprs as OR. */
	while (p.tok != TOK_EOF && !p.q->error) {
		if ((next = parse_or(&p)) == NULL) {
			expr_destroy(root);
			goto err;
		}
		root = expr_create_operator(EXPR_OP_OR, root, next);
	}
	if (p.q->error) {
		expr_destroy(root);
		goto err;
	}
	q->root = root;
	return 0;
err:
	if (p.tokstr != NULL)
		free(p.tokstr);
	if (!q->error)
		query_set_error(q);
	return 0;
}
